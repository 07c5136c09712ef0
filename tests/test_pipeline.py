"""Pipeline parallelism (parallel/pipeline): GPipe microbatch ring over a
mesh axis, equality vs the plain layer scan on the virtual 8-device CPU
mesh. Beyond the reference (torch-DDP data parallelism only; SURVEY §2)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from neuspeech1_tpu.parallel.pipeline import pipeline_scan


def _mesh(pipe=4, data=2):
    devs = np.array(jax.devices()[: data * pipe]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def _toy(seed=0, n_layers=8, d=16, b=16, t=5):
    rng = np.random.default_rng(seed)
    ws = jnp.asarray(rng.standard_normal((n_layers, d, d)).astype(np.float32)) * 0.3
    bs = jnp.asarray(rng.standard_normal((n_layers, d)).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    return ws, bs, x, c


def _body(h, xs, cst):
    w, b = xs
    return jnp.tanh(h @ w + b + cst)


def _ref(ws, bs, x, c):
    h, _ = lax.scan(lambda h, xs: (_body(h, xs, c), None), x, (ws, bs))
    return h


@pytest.mark.parametrize("microbatches", [None, 8])
def test_pipeline_scan_matches_plain_scan(microbatches):
    """Forward is bit-exact vs lax.scan (pure batch reindexing): default
    M=P and the deeper M=2P schedule both drain correctly."""
    ws, bs, x, c = _toy()
    mesh = _mesh()
    out = pipeline_scan(_body, (ws, bs), x, mesh, "pipe",
                        num_microbatches=microbatches, batch_axes="data",
                        consts=(c,))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_ref(ws, bs, x, c)))


def test_pipeline_scan_grads_match():
    """Plain jax.grad through the shard_map: per-stage param grads, the
    psum-transposed output cotangent, and the replicated-input transpose
    all land where the plain scan's do."""
    ws, bs, x, c = _toy(seed=3)
    mesh = _mesh()

    def loss_pp(ws, bs, x):
        o = pipeline_scan(_body, (ws, bs), x, mesh, "pipe",
                          batch_axes="data", consts=(c,))
        return jnp.sum(o ** 2)

    def loss_ref(ws, bs, x):
        return jnp.sum(_ref(ws, bs, x, c) ** 2)

    g_pp = jax.grad(loss_pp, argnums=(0, 1, 2))(ws, bs, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(ws, bs, x)
    for a, b in zip(g_pp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_scan_constraints():
    ws, bs, x, c = _toy(n_layers=6)  # 6 % 4 != 0
    with pytest.raises(ValueError):
        pipeline_scan(_body, (ws, bs), x, _mesh(), "pipe", consts=(c,))
    ws, bs, x, c = _toy(b=6)  # 6 % 4 microbatches != 0
    with pytest.raises(ValueError):
        pipeline_scan(_body, (ws, bs), x, _mesh(), "pipe", consts=(c,))


def test_model_pipeline_matches_plain():
    """Full model forward + grads with `pipeline_axis` GPipe-sharding BOTH
    stacks (4 layers over 4 stages, DP x PP mesh; the decoder's enc_out
    rides as a scheduled per-sample const) vs the plain scans."""
    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.models.init import init_params

    from tests.test_train import mini_cfg

    cfg = mini_cfg(encoder_layers=4, decoder_layers=4)
    cfg_pp = dataclasses.replace(cfg, pipeline_axis="pipe")
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg, stem)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((8, 6, 64)).astype(np.float32))
    dec_in = jnp.asarray(rng.integers(0, 60, (8, 8)).astype(np.int32))

    def loss(params, cfg):
        out = jw.forward(params, feats, dec_in, cfg, stem)
        return jnp.sum(out.astype(jnp.float32) ** 2) / out.size

    ref_l, ref_g = jax.value_and_grad(loss)(params, cfg)

    mesh = _mesh(pipe=4, data=2)
    with jax.sharding.set_mesh(mesh):
        pp_l, pp_g = jax.jit(
            jax.value_and_grad(lambda p: loss(p, cfg_pp)))(params)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(pp_g)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-5, atol=2e-5)
