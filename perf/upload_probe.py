"""Host->device feature-upload cost by dtype and crop length (round 5).

The e2e eval drive (perf/eval_e2e_drive.py) traced its 6.3 s/batch decode
phase to the feature upload itself: `block_until_ready` DOES wait on
transfers (unlike dispatches on this runtime), and the tunnel moves a
measured ~45 MB/s REGARDLESS of dtype — so wire bytes are everything.
Interleaved trials (dtype order rotates inside each iteration) control for
tunnel variance.

Measured medians (one v5e chip through the tunnel, [64, 208, 6000] batch):

    f32_full    638 MB/2 -> 319 MB   7325 ms   (44 MB/s)
    bf16_full   160 MB               3365 ms   (48 MB/s)
    f16_full    160 MB               3579 ms   (45 MB/s)
    i8_full      80 MB               1742 ms   (46 MB/s)
    bf16_crop6s  32 MB                713 ms   (45 MB/s)
    f16_crop6s   32 MB                668 ms   (48 MB/s)

Conclusions feeding cli/common.py::upload_features: (1) model-dtype (bf16)
upload halves f32 bytes exactly (the encoder casts on entry); (2) cropping
the zero pad tail (clips are 2-10 s padded to 30 s) is the big lever and is
exact because the device-side pad restores identical zeros; (3) int8 gives
no rate advantage beyond its byte count and would quantize real signal —
rejected.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
base = rng.standard_normal((64, 208, 6000)).astype(np.float32)
crop = base[:, :, :1200].copy()  # 6 s bucket = a typical clip length

red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
cases = [
    ("f32_full", lambda i: base * (1 + i * 1e-6)),
    ("bf16_full", lambda i: (base * (1 + i * 1e-6)).astype(jnp.bfloat16)),
    ("f16_full", lambda i: (base * (1 + i * 1e-6)).astype(np.float16)),
    ("i8_full", lambda i: np.clip((base * (1 + i * 1e-6)) * 127, -127,
                                  127).astype(np.int8)),
    ("bf16_crop6s", lambda i: (crop * (1 + i * 1e-6)).astype(jnp.bfloat16)),
    ("f16_crop6s", lambda i: (crop * (1 + i * 1e-6)).astype(np.float16)),
]
acc = {t: [] for t, _ in cases}
for i in range(3):
    for tag, mk in cases:
        fh = mk(i)  # fresh values each trial: the runtime caches uploads
        t0 = time.perf_counter()
        fd = jnp.asarray(fh)
        float(red(fd))  # one data-dependent fetch = the true sync
        dt = time.perf_counter() - t0
        acc[tag].append(dt)
        print(f"{tag} iter{i}: {dt * 1e3:.0f} ms ({fh.nbytes / 1e6:.0f} MB, "
              f"{fh.nbytes / 1e6 / dt:.0f} MB/s)", flush=True)
for tag, ts in acc.items():
    print(f"MEDIAN {tag}: {sorted(ts)[1] * 1e3:.0f} ms", flush=True)
