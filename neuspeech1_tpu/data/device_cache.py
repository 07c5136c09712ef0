"""Device-resident dataset cache: train with ZERO steady-state host->HBM
traffic.

Motivation: the input tensors are big ([B, 208, 6000]) and some hosts (e.g.
tunneled dev chips at ~20 MB/s, but also underpowered CPU hosts) cannot feed
the step loop. For corpora that fit in HBM — whisper-base leaves ~12 GB free,
i.e. ~2.4 GB/1k clips at bf16 — the entire epoch is staged once and batches
are assembled ON DEVICE by gather, keyed by a jax PRNG.

Usage:
    cache = DeviceCache.build(dataset, collator, max_label_len=64)
    sample = cache.make_sampler()              # jitted [key -> batch]
    for step in range(n):
        key, sub = jax.random.split(key)
        batch = sample(sub, batch_size)        # all on device
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from neuspeech1_tpu.config import LABEL_IGNORE_ID


class DeviceCache:
    def __init__(self, features, labels, decoder_input_ids, sharding=None):
        self.features = features
        self.labels = labels
        self.decoder_input_ids = decoder_input_ids
        self.n = features.shape[0]

    @staticmethod
    def build(
        dataset,
        collator,
        feature_dtype=jnp.bfloat16,
        sharding=None,
        limit: Optional[int] = None,
    ) -> "DeviceCache":
        """Stage the whole dataset through the collator once (the only
        host->device copy). `collator.max_label_len` must be set (static)."""
        assert collator.max_label_len is not None, (
            "DeviceCache needs a static max_label_len"
        )
        n = len(dataset) if limit is None else min(limit, len(dataset))
        samples = [dataset[i] for i in range(n)]
        batch = collator(samples)
        put = functools.partial(jax.device_put, device=sharding) if sharding \
            else jax.device_put
        return DeviceCache(
            put(jnp.asarray(batch["input_features"], feature_dtype)),
            put(jnp.asarray(batch["labels"], jnp.int32)),
            put(jnp.asarray(batch["decoder_input_ids"], jnp.int32)),
        )

    def nbytes(self) -> int:
        return sum(
            x.size * x.dtype.itemsize
            for x in (self.features, self.labels, self.decoder_input_ids)
        )

    def make_sampler(self, batch_size: int):
        """jitted `key -> batch` sampling with replacement (uniform).

        The cache arrays are passed as jit ARGUMENTS (device buffers), not
        captured constants — capturing would bake hundreds of MB into the
        HLO itself (and e.g. overflow remote-compile transports)."""
        n = self.n

        @functools.partial(jax.jit, static_argnames=("batch_size",))
        def _sample(features, labels, dec_in, key, batch_size):
            idx = jax.random.randint(key, (batch_size,), 0, n)
            return {
                "input_features": jnp.take(features, idx, axis=0),
                "labels": jnp.take(labels, idx, axis=0),
                "decoder_input_ids": jnp.take(dec_in, idx, axis=0),
            }

        def sample(key):
            return _sample(self.features, self.labels,
                           self.decoder_input_ids, key, batch_size)

        return sample

    def loader(self, batch_size: int, seed: int = 0):
        """DataLoader-compatible epoch iterable over on-device batches."""
        return _DeviceCacheLoader(self, batch_size, seed)

    def epoch_batches(self, key, batch_size: int):
        """Shuffled epoch as a list of on-device index gathers (no host
        data movement; only tiny index arrays cross)."""
        perm = jax.random.permutation(key, self.n)
        nb = self.n // batch_size
        for i in range(nb):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            yield {
                "input_features": jnp.take(self.features, idx, axis=0),
                "labels": jnp.take(self.labels, idx, axis=0),
                "decoder_input_ids": jnp.take(self.decoder_input_ids, idx, axis=0),
            }


class _DeviceCacheLoader:
    """Adapter matching the Trainer's loader protocol (iter -> batches)."""

    def __init__(self, cache: DeviceCache, batch_size: int, seed: int = 0):
        self.cache = cache
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return self.cache.n // self.batch_size

    def __iter__(self):
        key = jax.random.key(self.seed + self.epoch)
        self.epoch += 1
        yield from self.cache.epoch_batches(key, self.batch_size)
