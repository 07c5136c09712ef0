"""Shared CLI plumbing: model/tokenizer/adapter loading and saving.

Checkpoint formats understood:
  * `<path>.npz`           — our native full-param tree (`models/convert.py`)
  * directory with HF torch weights (pytorch_model.bin / model.safetensors)
    — ported via `params_from_hf_state_dict` (needs torch installed)
  * 'random'               — fresh initialization (testing / synthetic runs)

Adapter checkpoints (the PEFT-checkpoint equivalent) are the trainable
partition saved as npz: lora tree + stem/conv2 overrides.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.convert import (
    load_npz,
    params_from_hf_state_dict,
    save_npz,
)
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.utils.tokenizer import make_tokenizer


def load_base_params(
    base_model: str, config: WhisperConfig, stem: StemConfig, seed: int = 0
):
    """Resolve a --base_model argument into a parameter tree.

    Stock (speech) whisper checkpoints loaded for an EEG stem get the
    reference's stem-swap treatment (`finetune.py:143-148`): the transformer
    body + conv2 are ported, the projection stem is freshly initialized for
    the requested channel count.
    """
    import jax

    if base_model == "random":
        return init_params(jax.random.key(seed), config, stem)
    if base_model.endswith(".npz"):
        return load_npz(base_model)
    if os.path.isdir(base_model):
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(base_model, name)
            if os.path.exists(p):
                sd = _load_torch_state_dict(p)
                try:
                    return params_from_hf_state_dict(sd, config, stem)
                except KeyError:
                    if stem.kind == "speech":
                        raise
                    # stock speech checkpoint + EEG stem: port the body,
                    # swap in a fresh stem (reference finetune.py:143-148)
                    params = params_from_hf_state_dict(
                        sd, config, StemConfig("speech")
                    )
                    from neuspeech1_tpu.models.init import init_stem

                    params["encoder"]["stem"] = init_stem(
                        jax.random.key(seed), config, stem
                    )
                    print(f"[load] stock whisper checkpoint: swapped in a "
                          f"fresh '{stem.kind}' stem "
                          f"({stem.in_channels} channels)")
                    return params
        npz = os.path.join(base_model, "params.npz")
        if os.path.exists(npz):
            return load_npz(npz)
    raise FileNotFoundError(f"cannot resolve base model: {base_model}")


def _load_torch_state_dict(path: str) -> Dict[str, Any]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def save_full_model(out_dir: str, params, config: WhisperConfig,
                    stem: StemConfig) -> str:
    """Save a merged full model: params.npz + config.json (model geometry +
    stem), the analog of the reference's `full_model/` directory
    (`merge_lora.py:48-56`)."""
    os.makedirs(out_dir, exist_ok=True)
    save_npz(os.path.join(out_dir, "params.npz"), params)
    meta = {
        "config": {k: getattr(config, k) for k in (
            "vocab_size", "num_mel_bins", "d_model", "encoder_layers",
            "decoder_layers", "encoder_heads", "decoder_heads",
            "encoder_ffn", "decoder_ffn", "max_source_positions",
            "max_target_positions", "eot_id", "sot_id", "first_language_id",
            "num_languages", "translate_id", "transcribe_id", "startoflm_id",
            "startofprev_id", "nocaptions_id", "notimestamps_id",
        )},
        "stem": {"kind": stem.kind, "in_channels": stem.in_channels,
                 "dropout": stem.dropout},
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_full_model(model_dir: str) -> Tuple[Any, WhisperConfig, StemConfig]:
    with open(os.path.join(model_dir, "config.json")) as f:
        meta = json.load(f)
    config = WhisperConfig(**meta["config"])
    stem = StemConfig(**meta["stem"])
    params = load_npz(os.path.join(model_dir, "params.npz"))
    return params, config, stem


def commit_params(params):
    """Put a (possibly numpy) parameter tree on device once.

    Decode entry points pass `params` into jitted functions per batch;
    numpy leaves are re-transferred host->device on EVERY call (the jit
    executable cache only reuses committed jax.Array buffers). On the
    tunneled TPU runtime that cost ~5 s/batch of pure weight upload in
    the round-4 flagship serving drive."""
    import jax

    return jax.device_put(params)


def feature_true_len(feats, n_blocks: int = 8) -> int:
    """Block-aligned length past the last nonzero sample in a [B, ch, T]
    feature batch: a multiple of T/n_blocks in [T/n_blocks, T].

    Clips are zero-padded to the model's 30 s input geometry
    (data/dataset.py _pad_time, serve.Transcriber._prepare), so everything
    past this point is zeros the device can restore. Scans blocks from the
    END, so short-clip batches only read the zero tail at host memory
    bandwidth."""
    import numpy as np

    t = feats.shape[-1]
    block = max(1, t // n_blocks)
    n = t
    while n > block and not np.any(feats[..., n - block:n]):
        n -= block
    return n


def upload_features(feats, dtype, compact: bool = True):
    """Host->device feature upload, minimizing bytes on the wire.

    Two numerically-exact cuts (the round-5 tunnel probe measured uploads
    at ~45 MB/s regardless of dtype — bytes are everything):
    - cast to the model compute ``dtype`` on host: the encoder's first op
      is astype(config.dtype) (models/whisper.py encoder_apply), so the
      host-side cast commutes (2x for bf16);
    - ``compact``: crop trailing zero-padding before upload and zero-pad
      back on device (3-10x: clips are typically 2-10 s padded to 30 s;
      any real zeros cropped are restored identically)."""
    import jax.numpy as jnp
    import numpy as np

    t_full = feats.shape[-1]
    if compact:
        n = feature_true_len(feats)
        fd = jnp.asarray(np.asarray(feats[..., :n]).astype(dtype))
        if n < t_full:  # restore the zero tail on device (~free in HBM)
            pad = [(0, 0)] * (fd.ndim - 1) + [(0, t_full - n)]
            fd = jnp.pad(fd, pad)
        return fd
    return jnp.asarray(np.asarray(feats).astype(dtype))


def save_adapter(path: str, trainable) -> None:
    """Save the trainable partition (lora + stem/conv2) as npz."""
    save_npz(path, trainable)


def load_adapter(path: str) -> Dict[str, Any]:
    """-> {"model": {...overrides...}, "lora": {...}} (trees may be partial)."""
    return load_npz(path)


def apply_adapter(params, adapter: Dict[str, Any]):
    """Overlay adapter['model'] onto params; return (params, lora)."""
    overrides = adapter.get("model") or {}
    lora = adapter.get("lora") or None

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                out[k] = overlay(dst[k], v)
            else:
                out[k] = v
        return out

    return overlay(params, overrides), lora


def resolve_tokenizer(spec: str, config: Optional[WhisperConfig] = None):
    return make_tokenizer(spec, config)


def parse_config_overrides(args) -> WhisperConfig:
    """Build the model config from CLI args (whisper-base defaults; the
    byte-tokenizer layout when --tokenizer=byte)."""
    if getattr(args, "tokenizer", None) == "byte":
        layout = WhisperConfig.layout_for_vocab(256)
    else:
        layout = {}
    kw = dict(layout)
    size = getattr(args, "model_size", None)
    if size:
        from neuspeech1_tpu.config import WHISPER_PRESETS

        preset = dict(WHISPER_PRESETS[size])
        # layout wins over preset vocab for byte-tokenizer runs
        for k, v in preset.items():
            if k not in kw:
                kw[k] = v
    for name in ("d_model", "encoder_layers", "decoder_layers", "encoder_heads",
                 "decoder_heads", "encoder_ffn", "decoder_ffn",
                 "max_source_positions", "max_target_positions"):
        v = getattr(args, name, None)
        if v is not None:
            kw[name] = v
    if getattr(args, "bf16", True):
        kw["dtype"] = "bfloat16"
    else:
        kw["dtype"] = "float32"
    r = getattr(args, "remat", True)
    if isinstance(r, str):
        # 'auto' resolves later (finetune replaces the config once the
        # corpus size is known — train/memory.py); provisional True is the
        # memory-safe default for anything compiled before that
        from neuspeech1_tpu.utils.args import strtobool

        r = True if r.lower() == "auto" else strtobool(r)
    kw["remat"] = bool(r)
    return WhisperConfig(**kw)


def suppress_kwargs(spec: str, tokenizer) -> Dict[str, Any]:
    """GenerationConfig kwargs for a --suppress_tokens flag value.

    'default': derive the HF whisper suppress/begin-suppress lists from the
    tokenizer's vocab (`Tokenizer.default_suppress_ids` — the content of a
    downloaded generation_config.json, which the reference's generate
    override consumes at `utils/load_model.py:1210-1294`); 'none': both
    empty; otherwise a comma-separated id list (begin-suppress stays empty).
    """
    if spec == "default":
        return {
            "suppress_ids": tuple(tokenizer.default_suppress_ids()),
            "begin_suppress_ids": tuple(
                tokenizer.default_begin_suppress_ids()),
        }
    if spec in ("none", "", None):
        return {}
    return {"suppress_ids": tuple(int(x) for x in spec.split(","))}
