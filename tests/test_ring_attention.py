"""Ring (sequence-parallel) flash attention: equality vs single-device
attention on the virtual 8-device CPU mesh (kernels in interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neuspeech1_tpu.parallel.ring_attention import ring_flash_attention


def _qkv(b=2, h=2, t=512, d=64, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(dtype))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(dtype))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(dtype))
    return q, k, v


def _ref(q, k, v, kv_valid_len=None):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * d ** -0.5
    if kv_valid_len is not None:
        valid = jnp.arange(k.shape[1]) < kv_valid_len
        s = jnp.where(valid[None, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _seq_mesh(seq=4):
    devs = np.array(jax.devices()[: 2 * seq]).reshape(2, seq)
    return Mesh(devs, ("data", "seq"))


@pytest.mark.parametrize("kv_valid_len", [None, 470, 200])
def test_ring_forward_matches_reference(kv_valid_len):
    """Padding spilling into the last shard (470) and FULLY masking the
    trailing shards (200 < 2*128... masks shards 2,3 entirely at T=512/4)
    both merge exactly (the NaN-gated log-space merge)."""
    mesh = _seq_mesh(4)
    q, k, v = _qkv()
    ref = _ref(q, k, v, kv_valid_len)
    out = ring_flash_attention(q, k, v, mesh, "seq",
                               kv_valid_len=kv_valid_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_grads_match_reference():
    mesh = _seq_mesh(4)
    q, k, v = _qkv(seed=3)
    kv_valid_len = 450

    def loss_ring(q, k, v):
        o = ring_flash_attention(q, k, v, mesh, "seq",
                                 kv_valid_len=kv_valid_len)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        # grads only flow from VALID rows (padded-q rows are garbage by
        # contract); mask the loss the same way for both
        return jnp.sum(_ref(q, k, v, kv_valid_len).astype(jnp.float32) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_ring_batch_and_seq_axes_compose():
    """DP x SP: batch sharded over 'data' while the sequence rides 'seq'."""
    mesh = _seq_mesh(4)
    q, k, v = _qkv(b=4, t=512, seed=5)
    ref = _ref(q, k, v)
    out = ring_flash_attention(q, k, v, mesh, "seq", batch_axes="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_shard_constraints():
    mesh = _seq_mesh(4)
    q, k, v = _qkv(t=500)  # 500/4 = 125: not a lane multiple
    with pytest.raises(ValueError):
        ring_flash_attention(q, k, v, mesh, "seq")


def test_encoder_seq_parallel_matches_plain():
    """Full model forward + grads with `seq_parallel_axis` routing the
    encoder self-attention through the ring (ambient mesh) vs the plain
    XLA path. T=256 over 2 'seq' shards (128-lane quantum), 1024-sample
    inputs; padding/kv_len handled by encoder_apply's SP pad quantum."""
    import dataclasses

    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.models.init import init_params

    from tests.test_train import mini_cfg

    cfg = mini_cfg(d_model=128, encoder_heads=2, decoder_heads=2,
                   max_source_positions=256, max_target_positions=16)
    cfg_sp = dataclasses.replace(cfg, seq_parallel_axis="seq")
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg, stem)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 6, 1024)).astype(np.float32))
    dec_in = jnp.asarray(rng.integers(0, 60, (2, 8)).astype(np.int32))

    def loss(params, cfg):
        out = jw.forward(params, feats, dec_in, cfg, stem)
        return jnp.sum(out.astype(jnp.float32) ** 2) / out.size

    ref_l, ref_g = jax.value_and_grad(loss)(params, cfg)

    mesh = _seq_mesh(2)
    with jax.sharding.set_mesh(mesh):
        sp_l, sp_g = jax.jit(
            jax.value_and_grad(lambda p: loss(p, cfg_sp)))(params)
    np.testing.assert_allclose(float(sp_l), float(ref_l), rtol=1e-5)
    a = jax.tree_util.tree_leaves(ref_g)
    b = jax.tree_util.tree_leaves(sp_g)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-4)
