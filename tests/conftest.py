"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax is imported, the
JAX-native "fake cluster" idiom for testing multi-chip sharding without TPUs
(SURVEY §4). All tests therefore run on CPU with 8 visible devices.
"""

import os

# Hard-set (not setdefault): the machine's sitecustomize pins
# JAX_PLATFORMS=axon (the real TPU); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep XLA CPU from oversubscribing the (single-core) test machine.
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")

import jax

# sitecustomize may have imported jax already (axon TPU plugin registration);
# the config update below still wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from neuspeech1_tpu.data.synthetic import make_synthetic_corpus

    root = tmp_path_factory.mktemp("corpus")
    rows = make_synthetic_corpus(str(root), n_clips=12, n_channels=8, seed=0)
    return str(root), rows


@pytest.fixture(scope="session")
def tiny_tok():
    from neuspeech1_tpu.config import tiny_config
    from neuspeech1_tpu.utils.tokenizer import ByteTokenizer

    cfg = tiny_config()
    return ByteTokenizer(cfg)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running regression (convergence gate ~90s)"
    )
