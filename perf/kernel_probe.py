"""Flash fwd-kernel variant probe (honest chained timing). Variants are
local copies — production kernel untouched until a winner emerges."""
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
q0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)  # padded
k0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B*H, TK, D)), jnp.bfloat16)


def make_kernel(mode, block_q):
    def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if mode != "nomask":
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < T, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        if mode == "noexp":
            p = (s - m) * 0.001 + 1.0
        elif mode == "bf16exp":
            p = jnp.exp((s - m).astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / l
        o_ref[0] = o.astype(o_ref.dtype)

    def run(q, k, v):
        bh = q.shape[0]
        return pl.pallas_call(
            functools.partial(kern, scale=D**-0.5),
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


def timeit(tag, fn, K=20):
    try:
        f = jax.jit(fn)
        o = f(q0, k0, v0); float(jax.device_get(jnp.ravel(o)[0].astype(jnp.float32)))
        qq = q0
        t0 = time.perf_counter()
        for _ in range(K):
            o = f(qq, k0, v0)
            qq = o  # chain: output feeds next q (same shape)
        float(jax.device_get(jnp.ravel(o)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({"k": tag, "ms": round(dt*1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"k": tag, "error": str(e)[:160]}), flush=True)


for bq in (256, 512):
    for mode in ("base", "noexp", "bf16exp", "nomask"):
        timeit(f"{mode}_bq{bq}", make_kernel(mode, bq))
# pure matmul bound: same FLOPs as qk+pv without softmax machinery
mm = jax.jit(lambda q, k, v: jax.lax.dot_general(
    jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.bfloat16),
    v, (((2,), (1,)), ((0,), (0,)))))
timeit("xla_batched_2dots", mm)


# ---- variant: online softmax over K column-blocks (flash2 style) so the
# dot of block j+1 is data-independent of block j's softmax VPU work
def make_online(block_q, n_kb):
    kb_size = TK // n_kb

    def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
        q = q_ref[0]
        m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
        l = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc = jnp.zeros((q.shape[0], D), jnp.float32)
        for j in range(n_kb):
            k = k_ref[0, j * kb_size:(j + 1) * kb_size, :]
            v = v_ref[0, j * kb_size:(j + 1) * kb_size, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            kv_idx = j * kb_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < T, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    def run(q, k, v):
        bh = q.shape[0]
        return pl.pallas_call(
            functools.partial(kern, scale=D**-0.5),
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


for n_kb in (2, 4):
    timeit(f"online_bq512_kb{n_kb}", make_online(512, n_kb))

# ---- official kernel, tuned blocks
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as jflash,
    )
    q4 = q0.reshape(B, H, TK, D)
    k4 = k0.reshape(B, H, TK, D)
    v4 = v0.reshape(B, H, TK, D)
    bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1,
                    block_q_major_dkv=512, block_k_major_dkv=512,
                    block_k_dkv=512, block_q_dkv=512,
                    block_k_major_dq=512, block_k_dq=512, block_q_dq=512)
    off = jax.jit(lambda a, b, c: jflash(
        a.reshape(B, H, TK, D), b.reshape(B, H, TK, D),
        c.reshape(B, H, TK, D), causal=False, sm_scale=D**-0.5,
        block_sizes=bs).reshape(B*H, TK, D))
    timeit("official_tuned", off)
except Exception as e:
    print(json.dumps({"k": "official_tuned", "error": str(e)[:160]}))


# ---- variant: dimension_semantics hints (Mosaic may overlap instances)
def make_semantics(block_q, sem):
    def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < T, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / l
        o_ref[0] = o.astype(o_ref.dtype)

    def run(q, k, v):
        bh = q.shape[0]
        return pl.pallas_call(
            functools.partial(kern, scale=D**-0.5),
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
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=sem),
        )(q, k, v)
    return run


for sem in (("parallel", "parallel"), ("parallel", "arbitrary")):
    timeit(f"sem_{'_'.join(sem)}_bq512", make_semantics(512, sem))
    timeit(f"sem_{'_'.join(sem)}_bq256", make_semantics(256, sem))
