"""Standalone attention kernel timings at whisper-base encoder geometry:
B=64 H=8 Tq=Tkv=1500 D=64, bf16. Mine vs jax's official pallas TPU flash
vs XLA einsum. fwd and fwd+bwd (sum-of-grads trick, per-call host sync).
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache

enable_compilation_cache()

B, H, T, D = 64, 8, 1500, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)


def timeit(tag, fn, steps=8):
    try:
        o = fn(q, k, v)
        float(jax.device_get(jnp.ravel(o)[0]))
        times, qq = [], q
        for _ in range(steps):
            t0 = time.perf_counter()
            o = fn(qq, k, v)
            s = float(jax.device_get(jnp.ravel(o)[0]))
            times.append(time.perf_counter() - t0)
            qq = qq + jnp.asarray(s * 1e-12, jnp.bfloat16)
        print(json.dumps({"k": tag, "ms": round(sorted(times)[len(times)//2]*1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:200]}), flush=True)


# ---- mine
from neuspeech1_tpu.ops.flash_attention import flash_attention

mine_fwd = jax.jit(lambda a, b, c: jnp.sum(flash_attention(a, b, c).astype(jnp.float32)))
mine_bwd = jax.jit(jax.grad(lambda a, b, c: jnp.sum(flash_attention(a, b, c).astype(jnp.float32))))

# ---- official
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jflash, BlockSizes,
    )

    off = functools.partial(jflash, causal=False, sm_scale=D ** -0.5)
    off_fwd = jax.jit(lambda a, b, c: jnp.sum(off(a, b, c).astype(jnp.float32)))
    off_bwd = jax.jit(jax.grad(lambda a, b, c: jnp.sum(off(a, b, c).astype(jnp.float32))))
    HAVE_OFF = True
except Exception as e:
    print(json.dumps({"k": "official_import", "error": str(e)[:200]}))
    HAVE_OFF = False

# ---- XLA einsum f32-softmax
def xla_attn(a, b, c):
    s = jnp.einsum("bhqd,bhkd->bhqk", a, b).astype(jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(c.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, c)

xla_fwd = jax.jit(lambda a, b, c: jnp.sum(xla_attn(a, b, c).astype(jnp.float32)))
xla_bwd = jax.jit(jax.grad(lambda a, b, c: jnp.sum(xla_attn(a, b, c).astype(jnp.float32))))

timeit("mine_fwd", mine_fwd)
timeit("mine_fwdbwd", mine_bwd)
if HAVE_OFF:
    timeit("official_fwd", off_fwd)
    timeit("official_fwdbwd", off_bwd)
timeit("xla_fwd", xla_fwd)
timeit("xla_fwdbwd", xla_bwd)
