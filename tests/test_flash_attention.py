"""Flash attention kernel parity (interpret mode on CPU) + model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuspeech1_tpu.ops.flash_attention import flash_attention, flash_available


def ref_attention(q, k, v, causal=False):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * dh**-0.5
    if causal:
        tq, tk = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((tq, tk), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _qkv(b=1, h=2, tq=40, tkv=40, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, tkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, tkv, d)).astype(np.float32))
    return q, k, v


def test_forward_parity_unpadded():
    q, k, v = _qkv(tq=128, tkv=128)
    out = flash_attention(q, k, v)
    ref = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_forward_parity_with_padding():
    """Tq/Tkv not multiples of the block — exercises the masked pad path
    (whisper's T=1500 is exactly this case)."""
    q, k, v = _qkv(tq=40, tkv=75)
    out = flash_attention(q, k, v)
    ref = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_forward_causal():
    q, k, v = _qkv(tq=48, tkv=48)
    out = flash_attention(q, k, v, causal=True)
    ref = ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_cross_shape():
    q, k, v = _qkv(tq=16, tkv=100)
    out = flash_attention(q, k, v)
    assert out.shape == q.shape


def test_backward_parity():
    q, k, v = _qkv(tq=40, tkv=60, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_backward_parity_causal():
    q, k, v = _qkv(tq=32, tkv=32, d=16, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_flash_available_envelope():
    assert flash_available(1500, 64)       # whisper-base encoder
    assert not flash_available(100_000, 64)  # would blow VMEM


def test_model_forward_flash_vs_xla():
    """Full model: flash 'on' must match the XLA attention path."""
    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.models.init import init_params

    from tests.test_train import make_batch, mini_cfg

    import dataclasses

    cfg_off = mini_cfg(flash_attention="off")
    cfg_on = mini_cfg(flash_attention="on")
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg_off, stem)
    batch = make_batch(cfg_off, stem, b=2)
    ref = jw.forward(params, batch["input_features"],
                     batch["decoder_input_ids"], cfg_off, stem)
    out = jw.forward(params, batch["input_features"],
                     batch["decoder_input_ids"], cfg_on, stem)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_partitioned_execution_on_mesh():
    """custom_partitioning: sharded inputs stay sharded through the kernel
    (fwd and bwd) instead of being all-gathered and replicated."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    q, k, v = _qkv(b=8, h=2, tq=64, tkv=64, d=32)
    ref = np.asarray(flash_attention(q, k, v))
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(flash_attention, static_argnames=("causal", "block_q"))(
        qs, ks, vs
    )
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for a, b in zip(g_sh, g_ref):
        assert a.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


# ----------------------------------------------------------------------
# BTHD (transpose-free) kernel variant
# ----------------------------------------------------------------------

def _qkv_bthd(b=2, h=2, tq=40, tkv=40, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tkv, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tkv, h, d)).astype(np.float32))
    return q, k, v


def _ref_bthd(q, k, v, causal=False):
    out = ref_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                        v.transpose(0, 2, 1, 3), causal=causal)
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("tq,tkv,causal", [(128, 128, False), (40, 70, False),
                                           (96, 96, True)])
def test_bthd_forward_parity(tq, tkv, causal):
    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    q, k, v = _qkv_bthd(tq=tq, tkv=tkv)
    out = flash_attention_bthd(q, k, v, causal=causal)
    ref = _ref_bthd(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_bthd_backward_parity():
    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    q, k, v = _qkv_bthd(tq=48, tkv=40)

    def loss_f(fn):
        return lambda q, k, v: jnp.sum(jnp.tanh(fn(q, k, v)))

    g1 = jax.grad(loss_f(flash_attention_bthd), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_f(_ref_bthd), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


def test_bthd_partitioned_execution_on_mesh():
    """B sharded over 4 devices, H over 2 — the Shardy rule partitions both
    batch and head dims without resharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    q, k, v = _qkv_bthd(b=8, h=4, tq=32, tkv=32)
    sh = NamedSharding(mesh, P("dp", None, "tp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def f(q, k, v):
        return flash_attention_bthd(q, k, v)

    out = f(qs, ks, vs)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)

    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        jnp.tanh(flash_attention_bthd(q, k, v)))))(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(_ref_bthd(q, k, v))))(q, k, v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("tq", [300, 448])
def test_bthd_backward_tail_block_regression(tq):
    """256 < Tq < 512 regression (round-2 review): the backward's reduced
    q-block must divide the forward-padded Tq or tail dq rows are never
    written (were NaN) and dk/dv lose their contributions."""
    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    q, k, v = _qkv_bthd(b=1, h=2, tq=tq, tkv=tq)

    def loss_f(fn):
        return lambda q, k, v: jnp.sum(jnp.tanh(fn(q, k, v)))

    g1 = jax.grad(loss_f(flash_attention_bthd), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_f(_ref_bthd), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


# ----------------------------------------------------------------------
# BTC ([B, T, H*D]) kernel — the production layout: 3-D blocks, two heads
# per 128-lane block, no transposes or head reshapes around the kernel
# ----------------------------------------------------------------------

def _force_btc(monkeypatch):
    monkeypatch.setenv("NEUSPEECH_FLASH_LAYOUT", "btc")


@pytest.mark.parametrize("b,h,d,tq,tkv,causal", [
    (2, 8, 64, 128, 128, False),   # whisper head geometry, aligned
    (1, 4, 64, 40, 70, False),     # unaligned Tq/Tkv -> wrapper pads
    (1, 8, 64, 96, 96, True),      # causal
    (2, 4, 32, 33, 60, False),     # 4 heads per 128-lane block
])
def test_btc_forward_parity(monkeypatch, b, h, d, tq, tkv, causal):
    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    _force_btc(monkeypatch)
    q, k, v = _qkv_bthd(b=b, h=h, tq=tq, tkv=tkv, d=d)
    out = flash_attention_bthd(q, k, v, causal=causal)
    ref = _ref_bthd(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_btc_backward_parity(monkeypatch):
    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    _force_btc(monkeypatch)
    q, k, v = _qkv_bthd(b=1, h=8, tq=48, tkv=40, d=64)

    def loss_f(fn):
        return lambda q, k, v: jnp.sum(jnp.tanh(fn(q, k, v)))

    g1 = jax.grad(loss_f(flash_attention_bthd), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_f(_ref_bthd), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_btc_kv_len_masks_padded_rows(monkeypatch, causal):
    """kv_len semantics: zero-padded K/V rows must not contribute — fwd AND
    bwd equal the unpadded reference, and padded-row dk/dv are exactly 0."""
    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    _force_btc(monkeypatch)
    t, t_pad = 40, 64
    q, k, v = _qkv_bthd(b=1, h=8, tq=t_pad if causal else 24, tkv=t, d=64)
    kp = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    if causal:
        # causal requires Tq == Tkv: compare padded-causal vs masked ref on
        # the first t query rows only
        out = flash_attention_bthd(q, kp, vp, causal=True, kv_len=t)
        ref = _ref_bthd(q[:, :t], k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out[:, :t]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        return
    out = flash_attention_bthd(q, kp, vp, kv_len=t)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)

    def loss(fn, *args):
        return jnp.sum(jnp.tanh(fn(*args)))

    gq, gk, gv = jax.grad(
        lambda q, k, v: loss(flash_attention_bthd, q, k, v, False, None, t),
        argnums=(0, 1, 2))(q, kp, vp)
    rq, rk, rv = jax.grad(
        lambda q, k, v: loss(_ref_bthd, q, k, v), argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk[:, :t]), np.asarray(rk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv[:, :t]), np.asarray(rv),
                               rtol=2e-4, atol=2e-4)
    assert np.abs(np.asarray(gk[:, t:])).max() == 0.0
    assert np.abs(np.asarray(gv[:, t:])).max() == 0.0


def test_btc_partitioned_execution_on_mesh(monkeypatch):
    """BTC kernel shards over the batch dim (data/fsdp) without resharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    _force_btc(monkeypatch)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    q, k, v = _qkv_bthd(b=8, h=8, tq=32, tkv=32, d=64)
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def f(q, k, v):
        return flash_attention_bthd(q, k, v)

    out = f(qs, ks, vs)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)

    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        jnp.tanh(flash_attention_bthd(q, k, v)))))(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(_ref_bthd(q, k, v))))(q, k, v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)


def test_encoder_padded_t_matches_unpadded():
    """The flash encoder runs its layer stack at T padded to the q-block
    multiple (kv_len-masked); outputs on valid rows must equal the XLA
    (unpadded) path."""
    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.models.init import init_params

    from tests.test_train import make_batch, mini_cfg

    cfg_off = mini_cfg(flash_attention="off")
    cfg_on = mini_cfg(flash_attention="on")
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(3), cfg_off, stem)
    batch = make_batch(cfg_off, stem, b=2)
    ref = jw.encoder_apply(params, batch["input_features"], cfg_off, stem)
    out = jw.encoder_apply(params, batch["input_features"], cfg_on, stem)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("tq,tkv", [(1, 100), (4, 1500), (2, 130)])
def test_decode_cross_kernel_parity(tq, tkv):
    """Streaming decode cross-attention kernel (selectable on TPU for the
    incremental-decode cache path) vs the XLA reference. K/V arrive in the
    decode cache's BHTD layout."""
    from neuspeech1_tpu.ops.flash_attention import flash_decode_cross

    q, k, v = _qkv_bthd(b=2, h=8, tq=tq, tkv=tkv, d=64)
    out = flash_decode_cross(q, k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3))
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_decode_cross_kernel_kv_len():
    from neuspeech1_tpu.ops.flash_attention import flash_decode_cross

    t, t_store = 90, 128
    q, k, v = _qkv_bthd(b=1, h=4, tq=1, tkv=t, d=64)
    kp = jnp.pad(k, ((0, 0), (0, t_store - t), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, t_store - t), (0, 0), (0, 0)))
    out = flash_decode_cross(
        q, kp.transpose(0, 2, 1, 3), vp.transpose(0, 2, 1, 3), kv_len=t)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_decode_cross_gating_uses_bhtd_axes():
    """Regression (round-2 review): _decode_cross_ok must read (T_src, d,
    H) from the BHTD cache — the transposed axes made the whisper-base
    geometry always fail the VMEM check."""
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.ops.flash_attention import decode_cross_available

    # whisper-base cross cache: [B, H, T_src, Dh]
    assert decode_cross_available(1500, 64, 8)
    k = jnp.zeros((2, 8, 1500, 64), jnp.float32)
    import os
    old = os.environ.get("NEUSPEECH_FLASH_DECODE")
    os.environ["NEUSPEECH_FLASH_DECODE"] = "1"
    try:
        # gating should be decided by the (t_kv, d, h) = (1500, 64, 8)
        # envelope (True) AND the platform; on CPU it stays False
        from neuspeech1_tpu.ops.flash_attention import on_tpu

        assert jw._decode_cross_ok(k) == on_tpu()
    finally:
        if old is None:
            del os.environ["NEUSPEECH_FLASH_DECODE"]
        else:
            os.environ["NEUSPEECH_FLASH_DECODE"] = old


def test_btc_partitioned_head_sharding_on_mesh(monkeypatch):
    """BTC kernels shard the channel (head-group) dim — tensor-parallel
    activations run per-shard instead of being all-gathered."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    _force_btc(monkeypatch)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    # h=4, d=64 -> C=256; tp=2 -> 128 per shard = one head pair: valid
    q, k, v = _qkv_bthd(b=8, h=4, tq=32, tkv=32, d=64)
    sh = NamedSharding(mesh, P("dp", None, "tp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def f(q, k, v):
        return flash_attention_bthd(q, k, v)

    out = f(qs, ks, vs)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        jnp.tanh(flash_attention_bthd(q, k, v)))))(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(_ref_bthd(q, k, v))))(q, k, v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)


def test_bthd_layout_mesh_coverage_pinned(monkeypatch):
    """The H-sharding BTHD-native path keeps mesh coverage even though the
    default layout is now 'btc' (review: the h=4 geometry silently diverted
    to BTC)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    monkeypatch.setenv("NEUSPEECH_FLASH_LAYOUT", "bthd")
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    q, k, v = _qkv_bthd(b=8, h=4, tq=32, tkv=32, d=32)
    sh = NamedSharding(mesh, P("dp", None, "tp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: flash_attention_bthd(q, k, v))(qs, ks, vs)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_btc_channel_shard_fallback_on_mesh(monkeypatch):
    """When a channel shard would not be a lane/head-pair multiple (here
    tp=4 over C=256 -> 64 cols/shard < the 128-col head pair), the BTC
    partition must fall back to replicating the channel dim — correct
    results, no Mosaic block violation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

    _force_btc(monkeypatch)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "tp"))
    q, k, v = _qkv_bthd(b=4, h=4, tq=32, tkv=32, d=64)  # C=256
    sh = NamedSharding(mesh, P("dp", None, "tp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: flash_attention_bthd(q, k, v))(qs, ks, vs)
    ref = _ref_bthd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        jnp.tanh(flash_attention_bthd(q, k, v)))))(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(_ref_bthd(q, k, v))))(q, k, v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4,
                               atol=2e-4)


# ----------------------------------------------------------------------
# batched block-diagonal decode cross-attention (round 3)
# ----------------------------------------------------------------------

def test_decode_cross_btc_kernel_parity():
    """flash_decode_cross_btc (interpret mode on CPU) == reference einsum,
    including masking of zero-padded cache rows."""
    from neuspeech1_tpu.ops.flash_attention import flash_decode_cross_btc

    rng = np.random.default_rng(3)
    for (b, h, d, t, t_pad) in [(2, 8, 64, 37, 40), (3, 4, 32, 16, 16),
                                (1, 2, 128, 50, 56)]:
        c = h * d
        q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, t_pad, c)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t_pad, c)), jnp.float32)
        out = np.asarray(flash_decode_cross_btc(q, k, v, kv_len=t))
        kb = np.asarray(k).reshape(b, t_pad, h, d)[:, :t]
        vb = np.asarray(v).reshape(b, t_pad, h, d)[:, :t]
        s = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), kb) * (d ** -0.5)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bkhd->bqhd", p, vb)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"{(b, h, d, t)}")


def test_decode_cross_layouts_agree(monkeypatch):
    """Greedy decode tokens identical under the 'btc' (kernel) and 'bhtd'
    (XLA) cross-cache layouts; beam search (multi-row fallback) likewise."""
    import jax

    from neuspeech1_tpu.config import StemConfig, WhisperConfig
    from neuspeech1_tpu.decode.generate import (
        GenerationConfig, beam_search, greedy_decode)
    from neuspeech1_tpu.models.init import init_params

    cfg = WhisperConfig(
        **WhisperConfig.layout_for_vocab(64),
        num_mel_bins=8, d_model=128, encoder_layers=2, decoder_layers=2,
        encoder_heads=4, decoder_heads=4, encoder_ffn=128, decoder_ffn=128,
        max_source_positions=12, max_target_positions=24, dtype="float32",
    )  # d_head=32 -> hp=4, heads=4: BTC kernel available
    stem = StemConfig("base", in_channels=4)
    params = init_params(jax.random.key(5), cfg, stem)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 4, cfg.max_source_positions * 4)
                                ).astype(np.float32)
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id, cfg.notimestamps_id]] * 2,
                        np.int32)
    gen = GenerationConfig.for_model(cfg, max_length=12)
    genb = GenerationConfig.for_model(cfg, max_length=12, num_beams=3)

    outs = {}
    for layout in ("bhtd", "btc"):
        monkeypatch.setenv("NEUSPEECH_DECODE_CROSS", layout)
        g = np.asarray(greedy_decode(params, feats, prompt, cfg, stem, gen))
        bseq, bscore = beam_search(params, feats, prompt, cfg, stem, genb)
        outs[layout] = (g, np.asarray(bseq), np.asarray(bscore))
        # new trace per layout (env read inside init_cache at trace time)
        jax.clear_caches()
    np.testing.assert_array_equal(outs["btc"][0], outs["bhtd"][0])
    np.testing.assert_array_equal(outs["btc"][1], outs["bhtd"][1])
    np.testing.assert_allclose(outs["btc"][2], outs["bhtd"][2], rtol=1e-4)


def test_decoder_flash_self_gate_equality():
    """Decoder logits are identical whether the teacher-forcing decoder
    SELF-attention takes the flash kernel or the XLA path (the
    `decoder_flash_self_min_q` gate, round-3b: XLA wins below ~256 query
    tokens where the kernel is instance-overhead-bound). Cross-attention
    stays on the flash kernel in both configs."""
    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.models.init import init_params

    from tests.test_train import make_batch, mini_cfg

    cfg_self_flash = mini_cfg(flash_attention="on", decoder_flash_self_min_q=1)
    cfg_self_xla = mini_cfg(flash_attention="on",
                            decoder_flash_self_min_q=10_000)
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg_self_flash, stem)
    batch = make_batch(cfg_self_flash, stem, b=2)
    out_flash = jw.forward(params, batch["input_features"],
                           batch["decoder_input_ids"], cfg_self_flash, stem)
    out_xla = jw.forward(params, batch["input_features"],
                         batch["decoder_input_ids"], cfg_self_xla, stem)
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_flash),
                               rtol=2e-4, atol=2e-4)
