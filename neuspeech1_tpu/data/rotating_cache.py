"""Shard-rotating device cache: bigger-than-HBM corpora on the fast path.

`data/device_cache.py` stages the WHOLE corpus into HBM once — the fastest
configuration, but only for corpora inside the HBM budget. This module
extends the idea to arbitrary corpus sizes: the epoch is cut into shards
sized to HALF the cache budget, and while the train loop consumes on-device
batches gathered from the resident shard, a background thread collates and
`jax.device_put`s the NEXT shard (host->HBM copies overlap compute; two
slots resident at peak). Rotation over shards = one epoch.

Throughput model: each rotation trains ``shard_repeats`` passes over the
resident shard while the next stages, so end-to-end samples/s approaches
min(compute rate, repeats x staging bandwidth / bytes-per-clip). On
transfer-starved hosts raise ``shard_repeats`` (within-shard repetition is
the standard webdataset-style trade; batches never mix across shards).

No reference counterpart: the reference streams every batch from disk
through per-item `np.load` (`utils/reader.py:270`) and would starve at this
scale too (SURVEY §7 hard-parts item 6).
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


class _Shard:
    def __init__(self, indices, features, labels, decoder_input_ids):
        self.indices = indices
        self.features = features
        self.labels = labels
        self.decoder_input_ids = decoder_input_ids


class RotatingDeviceCache:
    """Iterable loader (Trainer protocol) over shard-rotated device batches.

    ``shard_clips``: clips per shard — size so that 2 shards fit the cache
    budget (`shards_for_budget` computes it).
    """

    def __init__(
        self,
        dataset,
        collator,
        shard_clips: int,
        batch_size: int,
        feature_dtype=jnp.bfloat16,
        sharding=None,
        seed: int = 0,
        shard_repeats: int = 1,
    ):
        assert collator.max_label_len is not None, (
            "RotatingDeviceCache needs a static max_label_len"
        )
        assert shard_clips >= batch_size, (
            f"shard_clips {shard_clips} < batch_size {batch_size}"
        )
        self.dataset = dataset
        self.collator = collator
        self.shard_clips = shard_clips
        self.batch_size = batch_size
        self.feature_dtype = feature_dtype
        self.sharding = sharding
        self.seed = seed
        self.shard_repeats = max(1, shard_repeats)
        self.n = len(dataset)
        self.epoch = 0

    @staticmethod
    def shards_for_budget(budget_bytes: int, bytes_per_clip: int) -> int:
        """Clips per shard with TWO shards resident (train + staging)."""
        return max(1, int(budget_bytes // 2) // max(1, bytes_per_clip))

    # ------------------------------------------------------------------
    def _stage(self, indices) -> _Shard:
        """Collate + device_put one shard (runs on the staging thread; the
        host->device copies are async and overlap the train loop)."""
        samples = [self.dataset[int(i)] for i in indices]
        batch = self.collator(samples)
        put = (lambda x: jax.device_put(x, self.sharding)) if self.sharding \
            else jax.device_put
        return _Shard(
            np.asarray(indices),
            put(jnp.asarray(batch["input_features"], self.feature_dtype)),
            put(jnp.asarray(batch["labels"], jnp.int32)),
            put(jnp.asarray(batch["decoder_input_ids"], jnp.int32)),
        )

    def __len__(self):
        per_shard = lambda m: (m // self.batch_size) * self.shard_repeats
        full, rem = divmod(self.n, self.shard_clips)
        return full * per_shard(self.shard_clips) + per_shard(rem)

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        perm = rng.permutation(self.n)
        shards = [perm[i : i + self.shard_clips]
                  for i in range(0, self.n, self.shard_clips)]

        nxt: list[Optional[_Shard]] = [None]

        def stage_into(i):
            nxt[0] = self._stage(shards[i])

        cur = self._stage(shards[0])
        for si in range(len(shards)):
            t = None
            if si + 1 < len(shards):
                t = threading.Thread(target=stage_into, args=(si + 1,),
                                     daemon=True)
                t.start()
            m = cur.features.shape[0]
            nb = m // self.batch_size
            for rep in range(self.shard_repeats):
                order = rng.permutation(m)
                for bi in range(nb):
                    idx = jnp.asarray(
                        order[bi * self.batch_size : (bi + 1) * self.batch_size]
                    )
                    yield {
                        "input_features": jnp.take(cur.features, idx, axis=0),
                        "labels": jnp.take(cur.labels, idx, axis=0),
                        "decoder_input_ids": jnp.take(
                            cur.decoder_input_ids, idx, axis=0),
                        "_indices": cur.indices[np.asarray(idx)],
                    }
            if t is not None:
                t.join()
                cur = nxt[0]  # old shard's buffers drop here; XLA frees
                nxt[0] = None  # them once in-flight consumers finish
