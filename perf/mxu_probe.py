"""MXU-rate probe inside Pallas: same output tile, varying contraction K.
If K=64 streams at near-full rate, the flash kernels are VPU/schedule-bound
and interleaving (not operand packing) is the lever. Also times a fwd flash
variant that software-pipelines q-subblocks (qk dot of subblock i+1 issued
before the softmax of subblock i, so MXU and VPU can overlap).
"""
import functools, json, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from neuspeech1_tpu import enable_compilation_cache
enable_compilation_cache()

NEG_INF = -1e30
B, H, T, D = 64, 8, 1500, 64
TK = 1536
rng = np.random.default_rng(0)


def timeit(tag, fn, args, K=20, chain=0):
    try:
        f = jax.jit(fn)
        o = f(*args)
        o0 = o[0] if isinstance(o, (tuple, list)) else o
        float(jax.device_get(jnp.ravel(o0)[0].astype(jnp.float32)))
        a = list(args)
        t0 = time.perf_counter()
        for _ in range(K):
            o = f(*a)
            o0 = o[0] if isinstance(o, (tuple, list)) else o
            a[chain] = o0  # data-dependent chain
        float(jax.device_get(jnp.ravel(o0)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({"k": tag, "ms": round(dt * 1e3, 2)}), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:200]}), flush=True)


# ---- 1. dot rate vs contraction size: out [512, 1536] = [512, K] @ [K, 1536]
def make_dot(kdim, n_grid):
    def kern(a_ref, b_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((1, 512, kdim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kdim, TK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 512, TK), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_grid, 512, TK), jnp.bfloat16),
        )(a, b)
    return run


N_GRID = 256
for kdim in (64, 128, 256, 512):
    a0 = jnp.asarray(rng.standard_normal((N_GRID, 512, kdim)), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((N_GRID, kdim, TK)), jnp.bfloat16)
    flops = N_GRID * 2 * 512 * kdim * TK
    run = make_dot(kdim, N_GRID)
    # chain: slice the output back to a's shape (data dependence, same shape)
    f = jax.jit(lambda x, y: run(x, y))
    try:
        o = f(a0, b0)
        float(jax.device_get(jnp.ravel(o)[0].astype(jnp.float32)))
        a = a0
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(a, b0)
            a = (o[:, :, :kdim] * 1e-12 + a0.astype(jnp.float32)).astype(jnp.bfloat16)
        float(jax.device_get(jnp.ravel(o)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 20
        print(json.dumps({"k": f"dot_k{kdim}", "ms": round(dt * 1e3, 2),
                          "tflops": round(flops / dt / 1e12, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": f"dot_k{kdim}", "error": str(e)[:200]}), flush=True)
    del a0, b0


# ---- 2. fwd flash kernel: baseline vs 2-subblock interleaved softmax
q0 = jnp.asarray(rng.standard_normal((B * H, TK, D)), jnp.bfloat16)
k0 = jnp.asarray(rng.standard_normal((B * H, TK, D)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B * H, TK, D)), jnp.bfloat16)


def make_fwd(block_q, n_sub):
    sub = block_q // n_sub
    scale = D ** -0.5

    def kern(q_ref, k_ref, v_ref, o_ref):
        k = k_ref[0]
        v = v_ref[0]
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (sub, TK), 1)
        mask = kv_idx < T
        # stage 1: all qk dots first (MXU), then softmax+pv per subblock.
        # Mosaic/hardware can overlap the independent VPU softmax of
        # subblock i with the pv dot of subblock i-1.
        ss = []
        for j in range(n_sub):
            q = q_ref[0, j * sub:(j + 1) * sub, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            ss.append(jnp.where(mask, s, NEG_INF))
        for j in range(n_sub):
            s = ss[j]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l
            o_ref[0, j * sub:(j + 1) * sub, :] = o.astype(o_ref.dtype)

    def run(q, k, v):
        bh = q.shape[0]
        return pl.pallas_call(
            kern,
            grid=(bh, TK // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, TK, D), q.dtype),
        )(q, k, v)
    return run


for n_sub in (1, 2, 4):
    timeit(f"fwd_bq512_sub{n_sub}", make_fwd(512, n_sub), (q0, k0, v0))
