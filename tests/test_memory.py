"""Auto-remat decision function (train/memory.py) — the policy bench.py and
the finetune CLI's --remat=auto share."""

import numpy as np

from neuspeech1_tpu.config import StemConfig, WhisperConfig, preset_config
from neuspeech1_tpu.train.memory import (
    param_count,
    resolve_remat,
    train_memory_plan,
    trainable_count_estimate,
)

HBM16 = 16 * 1024**3
STEM = StemConfig("base", in_channels=208)


def test_param_count_matches_real_tree():
    """The analytic count must track the actual init tree (±1%)."""
    import jax

    from neuspeech1_tpu.models.init import init_params

    cfg = WhisperConfig(dtype="float32")
    params = init_params(jax.random.key(0), cfg, STEM)
    real = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))
    est = param_count(cfg, STEM)
    assert abs(est - real) / real < 0.01, (est, real)


def test_auto_remat_flagship_is_false():
    """whisper-base bs64, LoRA r32, no corpus cache: the proven-fitting
    fast config (BASELINE.md round 2b) — auto must pick remat=False."""
    cfg = WhisperConfig()
    tc = trainable_count_estimate(cfg, STEM, ft_full=False, lora_rank=32)
    assert resolve_remat("auto", cfg, STEM, 64, trainable_count=tc,
                         label_len=64, hbm_bytes=HBM16) is False


def test_auto_remat_small_is_true():
    """whisper-small bs64 has ~3x the activations — must remat."""
    cfg = preset_config("small")
    assert resolve_remat("auto", cfg, STEM, 64, label_len=64,
                         hbm_bytes=HBM16) is True


def test_auto_remat_big_corpus_flips():
    """A device-cached corpus claiming HBM flips the same geometry back to
    remat=True."""
    cfg = WhisperConfig()
    tc = trainable_count_estimate(cfg, STEM, ft_full=False, lora_rank=32)
    assert resolve_remat("auto", cfg, STEM, 64, trainable_count=tc,
                         corpus_bytes=4 * 1024**3, label_len=64,
                         hbm_bytes=HBM16) is True


def test_explicit_values_win():
    cfg = preset_config("small")
    assert resolve_remat("false", cfg, STEM, 64, hbm_bytes=HBM16) is False
    assert resolve_remat("True", cfg, STEM, 64, hbm_bytes=HBM16) is True
    assert resolve_remat(False, cfg, STEM, 64, hbm_bytes=HBM16) is False


def test_plan_breakdown_consistent():
    cfg = WhisperConfig()
    plan = train_memory_plan(cfg, STEM, 64, hbm_bytes=HBM16)
    parts = (plan["params_bytes"] + plan["opt_bytes"] + plan["grads_bytes"]
             + plan["corpus_bytes"] + plan["activation_bytes"])
    assert plan["total_no_remat"] == parts
    # activations dominate at bs64 and scale linearly with batch
    plan32 = train_memory_plan(cfg, STEM, 32, hbm_bytes=HBM16)
    assert abs(plan["activation_bytes"] - 2 * plan32["activation_bytes"]) < 1e-6 * plan["activation_bytes"]
