"""Decompose the encoder MLP's cost on-chip (round-3 headroom item: the
fused MLP runs at 84 TF/s of the ~131 TF/s usable peak).

Candidate explanations measured separately at the exact training shape
([B*T, d] = [98304, 512], f=2048, bf16):
  dots       — fc1 + fc2 raw back-to-back dots (no activation): the
               achievable dot rate incl. the h HBM round-trip;
  mlp_exact  — fc1 + gelu(erf, f32 as jax.nn.gelu computes it) + fc2: the
               production spelling;
  mlp_tanh   — tanh-approx gelu (cheaper transcendental set);
  mlp_exact_bf16 — erf evaluated in bf16 (half the VPU lanes' bytes);
  mlp_relu   — trivial activation (isolates transcendental cost from the
               fusion structure);
  fc1_only   — one dot (is the h write the bottleneck?).

Chained-K timing, one final fetch (perf/overhead.py methodology). Each
variant's function returns a tensor the next iteration consumes.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache

enable_compilation_cache()

B_T = 64 * 1536
D, F = 512, 2048
FLOPS_MLP = 2 * B_T * D * F * 2  # fc1 + fc2
FLOPS_ONE = 2 * B_T * D * F // 1


def time_fn(fn, x, k=20, reps=3):
    y = fn(x)
    jax.block_until_ready(y)
    float(jnp.sum(y[0]))  # real sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        z = x
        for _ in range(k):
            z = fn(z)
        float(jnp.sum(z[0]))
        times.append((time.perf_counter() - t0) / k)
    return sorted(times)[1]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B_T, D)).astype(np.float32),
                    dtype=jnp.bfloat16) * 0.1
    w1 = jnp.asarray(rng.standard_normal((D, F)).astype(np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, D)).astype(np.float32) * 0.02,
                     dtype=jnp.bfloat16)

    def dots(x):
        return jnp.dot(x, w1) @ w2

    def mlp_exact(x):
        return jnp.dot(jax.nn.gelu(jnp.dot(x, w1), approximate=False), w2)

    def mlp_tanh(x):
        return jnp.dot(jax.nn.gelu(jnp.dot(x, w1), approximate=True), w2)

    def mlp_exact_bf16(x):
        h = jnp.dot(x, w1)
        g = h * 0.5 * (1.0 + jax.lax.erf(h * jnp.bfloat16(0.70710678)))
        return jnp.dot(g, w2)

    def mlp_relu(x):
        return jnp.dot(jax.nn.relu(jnp.dot(x, w1)), w2)

    def fc1_only(x):
        # project back down with a cheap slice-sum to keep shapes chained
        h = jnp.dot(x, w1)
        return h[:, :D] + h[:, D:2 * D] + h[:, 2 * D:3 * D] + h[:, 3 * D:]

    for name, fn, flops in [
        ("dots", dots, FLOPS_MLP),
        ("mlp_exact", mlp_exact, FLOPS_MLP),
        ("mlp_tanh", mlp_tanh, FLOPS_MLP),
        ("mlp_exact_bf16", mlp_exact_bf16, FLOPS_MLP),
        ("mlp_relu", mlp_relu, FLOPS_MLP),
        ("fc1_only", fc1_only, FLOPS_ONE),
    ]:
        dt = time_fn(jax.jit(fn), x)
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
