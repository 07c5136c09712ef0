"""On-chip e2e throughput of the shard-rotating device cache (VERDICT r2
item 7): a synthetic corpus sized to 2x a declared HBM cache budget, trained
with the flagship jitted step while shards stage host->HBM in the
background.

On this build host the host->HBM link is tunneled at ~20 MB/s
(BASELINE.md round-1), so the staging bandwidth term of the throughput
model dominates: samples/s ~= shard_repeats * link_MBps / MB_per_clip.
The panel sweeps shard_repeats to show the model and the crossover past
the 18.8 samples/s streaming baseline. On a real TPU host (PCIe/DMA,
10-100 GB/s) repeats=1 is already compute-bound.

One JSON line per row.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.data.rotating_cache import RotatingDeviceCache
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()

BS = 32
LABEL = 48
CH, T = 208, 6000
BYTES_PER_CLIP = CH * T * 2  # bf16 staged features
BUDGET_MB = 256              # declared cache budget for the bench
N_CLIPS = int(2 * BUDGET_MB * 1e6 / BYTES_PER_CLIP)  # corpus ~2x budget


class _SynthDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "input_features": rng.standard_normal((CH, T)).astype(np.float32),
            "labels": rng.integers(0, 50000, (LABEL,)).astype(np.int64),
        }


class _Collator:
    max_label_len = LABEL

    def __call__(self, samples):
        feats = np.stack([s["input_features"] for s in samples])
        labels = np.stack([s["labels"] for s in samples]).astype(np.int32)
        dec = np.roll(labels, 1, axis=1)
        dec[:, 0] = 50258
        return {"input_features": feats, "labels": labels,
                "decoder_input_ids": dec}


def main():
    config = WhisperConfig(remat=False)
    stem = StemConfig("base", in_channels=CH)
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500,
                            total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, fold_lora=True)

    shard_clips = RotatingDeviceCache.shards_for_budget(
        int(BUDGET_MB * 1e6), BYTES_PER_CLIP)
    print(json.dumps({
        "corpus_clips": N_CLIPS, "shard_clips": shard_clips,
        "budget_mb": BUDGET_MB,
        "corpus_mb": round(N_CLIPS * BYTES_PER_CLIP / 1e6),
    }), flush=True)

    ds = _SynthDataset(N_CLIPS)

    # compile once
    loader0 = RotatingDeviceCache(ds, _Collator(), shard_clips, BS,
                                  shard_repeats=1)
    for batch in loader0:
        batch.pop("_indices", None)
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
        break

    for repeats in (1, 8, 16):
        loader = RotatingDeviceCache(ds, _Collator(), shard_clips, BS,
                                     shard_repeats=repeats, seed=repeats)
        n_samples = 0
        t0 = time.perf_counter()
        for batch in loader:
            batch.pop("_indices", None)
            state, m = step(state, frozen, batch)
            n_samples += BS
        float(jax.device_get(m["loss"]))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "shard_repeats": repeats,
            "samples": n_samples,
            "wall_s": round(dt, 2),
            "samples_per_sec": round(n_samples / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
