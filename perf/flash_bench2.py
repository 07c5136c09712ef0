"""Calibrate chip peak + compare flash kernel variants at padded geometry."""
import functools, json, time
import jax, jax.numpy as jnp, numpy as np
from neuspeech1_tpu import enable_compilation_cache
enable_compilation_cache()

def timeit(tag, fn, *args, steps=6):
    try:
        o = fn(*args)
        float(jax.device_get(jnp.ravel(o)[0]))
        times, a0 = [], args[0]
        for _ in range(steps):
            t0 = time.perf_counter()
            o = fn(a0, *args[1:])
            s = float(jax.device_get(jnp.ravel(o)[0]))
            times.append(time.perf_counter() - t0)
            a0 = a0 + jnp.asarray(s*1e-12, a0.dtype)
        print(json.dumps({"k": tag, "ms": round(sorted(times)[len(times)//2]*1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:160]}), flush=True)

rng = np.random.default_rng(0)

# ---- pure matmul peak: 8192^3 bf16 = 1.1 TFLOP
a = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
bm = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
mm = jax.jit(lambda x, y: jnp.sum(jnp.dot(x, y, preferred_element_type=jnp.bfloat16).astype(jnp.float32)))
timeit("matmul8192", mm, a, bm)  # 1.1 TF / t = peak estimate

# ---- encoder-proj-like matmul: [96000,512]x[512,512]
x = jnp.asarray(rng.standard_normal((96000, 512)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
timeit("proj96k", mm, x, w)  # 50.3 GF

B,H,T,D = 64,8,1536,64
q = jnp.asarray(rng.standard_normal((B,H,T,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,H,T,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,H,T,D)), jnp.bfloat16)

from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jflash
off = functools.partial(jflash, causal=False, sm_scale=D**-0.5)
timeit("official_fwd_1536", jax.jit(lambda a,b,c: jnp.sum(off(a,b,c).astype(jnp.float32))), q, k, v)
timeit("official_fwdbwd_1536", jax.jit(jax.grad(lambda a,b,c: jnp.sum(off(a,b,c).astype(jnp.float32)))), q, k, v)

from neuspeech1_tpu.ops.flash_attention import flash_attention as mflash
for bq in (128, 256, 512):
    f = jax.jit(lambda a,b,c,bq=bq: jnp.sum(mflash(a,b,c,block_q=bq).astype(jnp.float32)))
    timeit(f"mine_fwd_1536_bq{bq}", f, q, k, v)
timeit("mine_fwdbwd_1536_bq512", jax.jit(jax.grad(lambda a,b,c: jnp.sum(mflash(a,b,c,block_q=512).astype(jnp.float32)))), q, k, v)
