"""Probe: flash BACKWARD kernel dot-operand dtype (f32 vs bf16 operands,
f32 accumulation either way) + backward block_q. The production backward
feeds every dot f32 operands; MXU is native bf16xbf16->f32, so f32 dots
lower to multiple passes. Chained timing (one final fetch).
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
q0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)
k0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)
o0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)
do0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)
lse0 = jnp.asarray(rng.standard_normal((B*H, 8, TK)) * 0.1 + 8.0, jnp.float32)


def make_bwd(block_q, *, bf16_ops):
    n_q_blocks = TK // block_q
    scale = D ** -0.5

    def kern(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc):
        qb = pl.program_id(1)
        k = k_ref[0]
        v = v_ref[0]

        @pl.when(qb == 0)
        def _():
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

        q = q_ref[0]
        o = o_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < T, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])

        if bf16_ops:
            p_in = p.astype(jnp.bfloat16)
            do_in = do
            v_in = v
            dv_acc[...] += jax.lax.dot_general(
                p_in, do_in, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do_in, v_in, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                            axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0] = dq.astype(dq_ref.dtype)
            dk_acc[...] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            do_f = do.astype(jnp.float32)
            o_f = o.astype(jnp.float32)
            dv_acc[...] += jax.lax.dot_general(
                p, do_f, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do_f, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = jnp.sum(do_f * o_f, axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dq = jax.lax.dot_general(
                ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0] = dq.astype(dq_ref.dtype)
            dk_acc[...] += jax.lax.dot_general(
                ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(qb == n_q_blocks - 1)
        def _():
            dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    def run(q, k, v, o, do, lse):
        bh = q.shape[0]
        return pl.pallas_call(
            kern,
            grid=(bh, n_q_blocks),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, TK, D), q.dtype),
                jax.ShapeDtypeStruct((bh, TK, D), k.dtype),
                jax.ShapeDtypeStruct((bh, TK, D), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((TK, D), jnp.float32),
                pltpu.VMEM((TK, D), jnp.float32),
            ],
        )(q, k, v, o, do, lse)
    return run


def timeit(tag, fn, K=20):
    try:
        f = jax.jit(fn)
        outs = f(q0, k0, v0, o0, do0, lse0)
        float(jax.device_get(jnp.ravel(outs[0])[0].astype(jnp.float32)))
        qq = q0
        t0 = time.perf_counter()
        for _ in range(K):
            outs = f(qq, k0, v0, o0, do0, lse0)
            qq = outs[0]  # dq feeds next q: data-dependent chain
        float(jax.device_get(jnp.ravel(outs[0])[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({"k": tag, "ms": round(dt*1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    for bq in (256, 512):
        for bf16_ops in (False, True):
            timeit(f"bwd_bq{bq}_{'bf16' if bf16_ops else 'f32'}ops",
                   make_bwd(bq, bf16_ops=bf16_ops))
