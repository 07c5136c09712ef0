"""Quantify the per-call dispatch+sync floor of the axon runtime and
validate chained-dispatch timing (N data-dependent calls, one final fetch).
"""
import json, time
import jax, jax.numpy as jnp, numpy as np
from neuspeech1_tpu import enable_compilation_cache
enable_compilation_cache()

# pure round-trip: trivial op, per-call fetch
x = jnp.zeros(())
f = jax.jit(lambda v: v + 1.0)
f(x); float(f(x))
times = []
for _ in range(20):
    t0 = time.perf_counter()
    x = f(x)
    s = float(x)
    times.append(time.perf_counter() - t0)
print(json.dumps({"k": "roundtrip_ms", "ms": round(sorted(times)[10]*1e3, 2)}), flush=True)

# matmul proj96k: per-call-synced vs chained-K
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((96000, 512)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
g = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.bfloat16))
y = g(a, w); float(jnp.ravel(y)[0].astype(jnp.float32))

def chained(K):
    x0 = a
    t0 = time.perf_counter()
    for _ in range(K):
        x0 = g(x0, w)
    s = float(jnp.ravel(x0)[0].astype(jnp.float32))
    return time.perf_counter() - t0

for K in (1, 5, 10, 20):
    ts = [chained(K) for _ in range(3)]
    t = sorted(ts)[1]
    print(json.dumps({"k": f"proj96k_chain{K}", "total_ms": round(t*1e3, 2),
                      "per_call_ms": round(t*1e3/K, 2)}), flush=True)
