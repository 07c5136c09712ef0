"""Probe: flash kernels reading the NATIVE [B, T, H*D] layout with 3-D
blocks. Grid (B, head_pairs, nq); each block covers 2 heads (128 lanes — the
minimum legal lane-dim block), heads split by static 64-lane slices inside
the kernel. If Mosaic accepts this, the layout kills the BTHD->BHTD
transpose copies (~34 ms/step in situ) AND (with the encoder run at padded
T) the per-call pad/slice ops (~43 ms/step).
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
C = H * D
HP = 2 * D  # two heads per block
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((B, TK, C)), jnp.bfloat16)
k0 = jnp.asarray(rng.standard_normal((B, TK, C)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B, TK, C)), jnp.bfloat16)


def make_fwd_btc(block_q):
    scale = D ** -0.5

    def kern(q_ref, k_ref, v_ref, o_ref, lse_ref):
        for hh in range(2):
            sl = slice(hh * D, (hh + 1) * D)
            q = q_ref[0, :, sl]          # [BQ, D] lane-sliced
            k = k_ref[0, :, sl]          # [TK, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < T, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
            lse = (m + jnp.log(l))[:, 0]
            lse_ref[0, hh * 8:(hh + 1) * 8, :] = jnp.broadcast_to(
                lse[None, :], (8, lse.shape[0]))

    def run(q, k, v):
        b = q.shape[0]
        return pl.pallas_call(
            kern,
            grid=(b, C // HP, TK // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, block_q), lambda b, h, i: (b, h, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, TK, C), q.dtype),
                jax.ShapeDtypeStruct((b, 8 * H, TK), jnp.float32),
            ],
        )(q, k, v)
    return run


def make_bwd_btc(block_q):
    scale = D ** -0.5
    n_q_blocks = TK // block_q

    def kern(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc):
        qb = pl.program_id(2)

        @pl.when(qb == 0)
        def _():
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

        for hh in range(2):
            sl = slice(hh * D, (hh + 1) * D)
            q = q_ref[0, :, sl]
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            o = o_ref[0, :, sl]
            do = do_ref[0, :, sl]
            lse = lse_ref[0, hh * 8, :]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < T, s, NEG_INF)
            p = jnp.exp(s - lse[:, None])

            do_f = do.astype(jnp.float32)
            dv_acc[:, sl] += jax.lax.dot_general(
                p, do_f, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do_f, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = jnp.sum(do_f * o.astype(jnp.float32), axis=-1,
                            keepdims=True)
            ds = p * (dp - delta) * scale
            dq = jax.lax.dot_general(
                ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_acc[:, sl] += jax.lax.dot_general(
                ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(qb == n_q_blocks - 1)
        def _():
            dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    def run(q, k, v, o, do, lse):
        b = q.shape[0]
        return pl.pallas_call(
            kern,
            grid=(b, C // HP, n_q_blocks),
            in_specs=[
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, block_q), lambda b, h, i: (b, h, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, TK, C), q.dtype),
                jax.ShapeDtypeStruct((b, TK, C), k.dtype),
                jax.ShapeDtypeStruct((b, TK, C), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((TK, HP), jnp.float32),
                pltpu.VMEM((TK, HP), jnp.float32),
            ],
        )(q, k, v, o, do, lse)
    return run


def timeit(tag, fn, args, K=20):
    try:
        f = jax.jit(fn)
        o = f(*args)
        o0 = o[0] if isinstance(o, (tuple, list)) else o
        float(jax.device_get(jnp.ravel(o0)[0].astype(jnp.float32)))
        a = list(args)
        t0 = time.perf_counter()
        for _ in range(K):
            o = f(*a)
            a[0] = o[0] if isinstance(o, (tuple, list)) else o
        float(jax.device_get(jnp.ravel(a[0])[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({"k": tag, "ms": round(dt * 1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    f = jax.jit(make_fwd_btc(512))
    try:
        o, lse = f(q0[:2], k0[:2], v0[:2])
        qh = np.asarray(q0[:2], np.float32).reshape(2, TK, H, D)
        kh = np.asarray(k0[:2], np.float32).reshape(2, TK, H, D)
        vh = np.asarray(v0[:2], np.float32).reshape(2, TK, H, D)
        s = np.einsum("bqhd,bkhd->bhqk", qh, kh) * D**-0.5
        s[:, :, :, T:] = -1e30
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bkhd->bqhd", p, vh).reshape(2, TK, C)
        err = np.abs(np.asarray(o, np.float32)[:, :T] - ref[:, :T]).max()
        print(json.dumps({"k": "fwd_btc_maxerr", "v": float(err)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": "fwd_btc_sanity", "error": str(e)[:400]}),
              flush=True)
    for bq in (512, 256):
        timeit(f"fwd_btc_bq{bq}", make_fwd_btc(bq), (q0, k0, v0))
    o0 = jnp.asarray(rng.standard_normal((B, TK, C)), jnp.bfloat16)
    do0 = jnp.asarray(rng.standard_normal((B, TK, C)), jnp.bfloat16)
    lse0 = jnp.asarray(rng.standard_normal((B, 64, TK)) * 0.1 + 8.0,
                       jnp.float32)
    for bq in (512, 256, 192):
        timeit(f"bwd_btc_bq{bq}", make_bwd_btc(bq),
               (q0, k0, v0, o0, do0, lse0))


# ---- dimension_semantics variants on the BTC fwd shapes (measured: no
# effect — 5.42-5.47 ms vs 5.48 base at whisper-base geometry)
def make_fwd_btc_sem(block_q, sem):
    scale = D ** -0.5

    def kern(q_ref, k_ref, v_ref, o_ref, lse_ref):
        for hh in range(2):
            sl = slice(hh * D, (hh + 1) * D)
            q = q_ref[0, :, sl]
            k = k_ref[0, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < T, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
            lse = (m + jnp.log(l))[:, 0]
            lse_ref[0, hh * 8:(hh + 1) * 8, :] = jnp.broadcast_to(
                lse[None, :], (8, lse.shape[0]))

    def run(q, k, v):
        b = q.shape[0]
        return pl.pallas_call(
            kern,
            grid=(b, C // HP, TK // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, HP), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, HP), lambda b, h, i: (b, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, block_q), lambda b, h, i: (b, h, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, TK, C), q.dtype),
                jax.ShapeDtypeStruct((b, 8 * H, TK), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        )(q, k, v)
    return run


if __name__ == "__main__" and "sem" in __import__("sys").argv:
    for sem in (("parallel", "parallel", "arbitrary"),
                ("parallel", "arbitrary", "arbitrary"),
                ("arbitrary", "arbitrary", "arbitrary")):
        timeit(f"fwd_sem_{'_'.join(s[:3] for s in sem)}",
               make_fwd_btc_sem(512, sem), (q0, k0, v0))
