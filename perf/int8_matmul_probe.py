"""int8 MXU rate probe — is quantized-matmul training worth building?

v5e datasheet: int8 ~394 TOPS = 2x bf16. This measures what THIS chip's
XLA actually delivers for int8 dot_general (preferred_element_type=int32)
vs bf16, at calibration shapes (8192^3) and at the model's hot matmul
shapes (fc1/fc2 fwd + the dW accumulations), including the realistic
AQT-style op: dynamic per-row absmax quantize -> int8 dot -> per-channel
dequantize to bf16.

Methodology (CLAUDE.md): K chained data-dependent iterations, ONE final
device->host fetch; each iteration's input derives from the previous
output so the runtime cannot elide or overlap-hide work. The feedback
transform is a tiny elementwise pass on [M, K_dim] in both variants, so
bf16-vs-int8 deltas are dot-rate deltas.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(0)


def chain_time(tag, step, x0, iters=12, repeats=3, flops=None, args=()):
    """``args``: extra device arrays passed through each call as explicit
    jit arguments (NOT closure constants — a closed-over ~400 MB bf16
    weight gets inlined into the HLO and pushes the remote-compile request
    over its HTTP body limit, CLAUDE.md)."""
    try:
        f = jax.jit(step)
        x = f(x0, *args)
        float(jax.device_get(jnp.ravel(x)[0].astype(jnp.float32)))  # compile+sync
        best = None
        for _ in range(repeats):
            x = x0
            t0 = time.perf_counter()
            for _ in range(iters):
                x = f(x, *args)
            float(jax.device_get(jnp.ravel(x)[0].astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        out = {"k": tag, "ms": round(best * 1e3, 3)}
        if flops:
            out["tflops"] = round(flops / best / 1e12, 1)
        print(json.dumps(out), flush=True)
        return best
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:200]}), flush=True)
        return None


def probe_square(n=8192):
    flops = 2.0 * n * n * n
    wb = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    wi = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)

    def bf16_step(x):
        y = jnp.dot(x, wb, preferred_element_type=jnp.bfloat16)
        return (y * jnp.bfloat16(1.0 / n)).astype(jnp.bfloat16)

    x0 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    chain_time(f"bf16_{n}", bf16_step, x0, flops=flops)

    def int8_step(x):
        y = jax.lax.dot_general(
            x, wi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y >> 7).astype(jnp.int8)

    xi0 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    chain_time(f"int8_{n}", int8_step, xi0, flops=flops)

    # realistic AQT op: bf16 in -> dynamic rowwise quantize -> int8 dot ->
    # per-channel dequant -> bf16 out (weights pre-quantized w/ scales)
    w_scale = jnp.asarray(rng.standard_normal((1, n)) ** 2 + 0.5,
                          jnp.float32)

    def aqt_step(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True) + 1e-6
        xq = jnp.round(x.astype(jnp.float32) * (127.0 / amax)).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (amax / 127.0) * w_scale
        return (y * (1.0 / n)).astype(jnp.bfloat16)

    chain_time(f"aqt_{n}", aqt_step, x0, flops=flops)


def probe_model_shapes():
    # whisper-base bs64 padded encoder: M = 64*1536 tokens, d=512, ffn=2048
    M, K, N = 64 * 1536, 512, 2048
    flops = 2.0 * M * K * N
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    def bf16_step(x):
        y = jnp.dot(x, wb, preferred_element_type=jnp.bfloat16)
        return y[:, :K] * jnp.bfloat16(1.0 / K)

    chain_time("bf16_fc1", bf16_step, x0, flops=flops)

    def aqt_step(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True) + 1e-6
        xq = jnp.round(x.astype(jnp.float32) * (127.0 / amax)).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (amax / 127.0)
        return (y[:, :K] * (1.0 / K)).astype(jnp.bfloat16)

    chain_time("aqt_fc1", aqt_step, x0, flops=flops)

    # dW shape: [K=512, M] x [M, N=2048] contraction over tokens — the big
    # [M, N] operand rides as an explicit jit arg (see chain_time)
    xT = jnp.asarray(rng.standard_normal((K, M)), jnp.bfloat16)
    wb2 = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
    flops_dw = 2.0 * K * M * N

    def bf16_dw_step(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        # feedback: fold a scalar of y back into x (keeps the chain honest)
        return x * (jnp.bfloat16(1.0) + y[0, 0] * jnp.bfloat16(1e-12))

    chain_time("bf16_dW", bf16_dw_step, xT, flops=flops_dw, args=(wb2,))

    wq2 = jnp.asarray(rng.integers(-127, 127, (M, N)), jnp.int8)

    def aqt_dw_step(x, w):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True) + 1e-6
        xq = jnp.round(x.astype(jnp.float32) * (127.0 / amax)).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return x * (jnp.bfloat16(1.0)
                    + y[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-12))

    chain_time("aqt_dW", aqt_dw_step, xT, flops=flops_dw, args=(wq2,))


if __name__ == "__main__":
    probe_square(8192)
    probe_model_shapes()
