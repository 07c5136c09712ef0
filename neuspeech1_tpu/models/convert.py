"""HF <-> JAX parameter conversion.

The reference fine-tunes `openai/whisper-base` checkpoints loaded through HF
transformers (`finetune.py:127`); this module ports such checkpoints into the
stacked-pytree layout of `models/whisper.py` and back (for export after
`merge_lora`). Works from a plain state-dict mapping (torch tensors or numpy
arrays), so no torch dependency is required at runtime when loading `.npz`.

Layout transforms:
  * torch Linear weight [out, in]  ->  ours [in, out] (transpose)
  * torch Conv1d weight [out, in, k] -> unchanged
  * per-layer tensors stacked along a new leading axis L
  * proj_out is tied to decoder.embed_tokens (reference
    `utils/load_model.py:947`), so only the embedding is stored.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from neuspeech1_tpu.config import StemConfig, WhisperConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _get(sd: Mapping, name: str) -> np.ndarray:
    if name not in sd:
        raise KeyError(f"missing weight: {name}")
    return _np(sd[name])


def _stack_linear(sd, pattern: str, n: int, bias: bool = True) -> Params:
    w = np.stack([_get(sd, pattern.format(i) + ".weight").T for i in range(n)])
    p = {"w": w}
    if bias:
        p["b"] = np.stack([_get(sd, pattern.format(i) + ".bias") for i in range(n)])
    return p


def _stack_ln(sd, pattern: str, n: int) -> Params:
    return {
        "scale": np.stack([_get(sd, pattern.format(i) + ".weight") for i in range(n)]),
        "bias": np.stack([_get(sd, pattern.format(i) + ".bias") for i in range(n)]),
    }


def _attn_block(sd, prefix: str, n: int) -> Params:
    return {
        "q": _stack_linear(sd, prefix + ".q_proj", n),
        "k": _stack_linear(sd, prefix + ".k_proj", n, bias=False),
        "v": _stack_linear(sd, prefix + ".v_proj", n),
        "out": _stack_linear(sd, prefix + ".out_proj", n),
    }


def _conv(sd, name: str) -> Params:
    return {"w": _get(sd, name + ".weight"), "b": _get(sd, name + ".bias")}


def _stem_from_sd(sd, stem: StemConfig) -> Params:
    """conv1 naming depends on the injected stem module:
    'speech' -> model.encoder.conv1.{weight,bias};
    'base'   -> Sequential: conv1.0.* and conv1.2.* (gelu at index 1);
    'replace'-> model.encoder.conv1.{weight,bias} with EEG channel count."""
    if stem.kind == "speech":
        return {"conv1": _conv(sd, "model.encoder.conv1")}
    if stem.kind == "base":
        return {
            "conv_a": _conv(sd, "model.encoder.conv1.0"),
            "conv_b": _conv(sd, "model.encoder.conv1.2"),
        }
    if stem.kind == "replace":
        return {"conv": _conv(sd, "model.encoder.conv1")}
    if stem.kind == "premel":
        # MyWhisper's pre_conv1 (utils/load_model.py:1416) + original conv1
        return {
            "pre_conv": _conv(sd, "pre_conv1"),
            "conv1": _conv(sd, "model.encoder.conv1"),
        }
    raise ValueError(stem.kind)


def params_from_hf_state_dict(
    sd: Mapping, config: WhisperConfig, stem: StemConfig
) -> Params:
    ne, nd = config.encoder_layers, config.decoder_layers
    e = "model.encoder.layers.{}"
    d = "model.decoder.layers.{}"
    encoder = {
        "stem": _stem_from_sd(sd, stem),
        "conv2": _conv(sd, "model.encoder.conv2"),
        "pos_embed": _get(sd, "model.encoder.embed_positions.weight"),
        "layers": {
            "self_attn": _attn_block(sd, e + ".self_attn", ne),
            "self_attn_ln": _stack_ln(sd, e + ".self_attn_layer_norm", ne),
            "fc1": _stack_linear(sd, e + ".fc1", ne),
            "fc2": _stack_linear(sd, e + ".fc2", ne),
            "final_ln": _stack_ln(sd, e + ".final_layer_norm", ne),
        },
        "ln_post": {
            "scale": _get(sd, "model.encoder.layer_norm.weight"),
            "bias": _get(sd, "model.encoder.layer_norm.bias"),
        },
    }
    decoder = {
        "token_embed": _get(sd, "model.decoder.embed_tokens.weight"),
        "pos_embed": _get(sd, "model.decoder.embed_positions.weight"),
        "layers": {
            "self_attn": _attn_block(sd, d + ".self_attn", nd),
            "self_attn_ln": _stack_ln(sd, d + ".self_attn_layer_norm", nd),
            "cross_attn": _attn_block(sd, d + ".encoder_attn", nd),
            "cross_attn_ln": _stack_ln(sd, d + ".encoder_attn_layer_norm", nd),
            "fc1": _stack_linear(sd, d + ".fc1", nd),
            "fc2": _stack_linear(sd, d + ".fc2", nd),
            "final_ln": _stack_ln(sd, d + ".final_layer_norm", nd),
        },
        "ln": {
            "scale": _get(sd, "model.decoder.layer_norm.weight"),
            "bias": _get(sd, "model.decoder.layer_norm.bias"),
        },
    }
    return {"encoder": encoder, "decoder": decoder}


def params_to_hf_state_dict(
    params: Params, config: WhisperConfig, stem: StemConfig
) -> Dict[str, np.ndarray]:
    """Inverse mapping (numpy arrays) for exporting merged full models."""
    sd: Dict[str, np.ndarray] = {}

    def put(name, x):
        sd[name] = np.asarray(x)

    enc, dec = params["encoder"], params["decoder"]
    sp = enc["stem"]
    if stem.kind == "speech":
        put("model.encoder.conv1.weight", sp["conv1"]["w"])
        put("model.encoder.conv1.bias", sp["conv1"]["b"])
    elif stem.kind == "base":
        put("model.encoder.conv1.0.weight", sp["conv_a"]["w"])
        put("model.encoder.conv1.0.bias", sp["conv_a"]["b"])
        put("model.encoder.conv1.2.weight", sp["conv_b"]["w"])
        put("model.encoder.conv1.2.bias", sp["conv_b"]["b"])
    elif stem.kind == "premel":
        put("pre_conv1.weight", sp["pre_conv"]["w"])
        put("pre_conv1.bias", sp["pre_conv"]["b"])
        put("model.encoder.conv1.weight", sp["conv1"]["w"])
        put("model.encoder.conv1.bias", sp["conv1"]["b"])
    else:
        put("model.encoder.conv1.weight", sp["conv"]["w"])
        put("model.encoder.conv1.bias", sp["conv"]["b"])
    put("model.encoder.conv2.weight", enc["conv2"]["w"])
    put("model.encoder.conv2.bias", enc["conv2"]["b"])
    put("model.encoder.embed_positions.weight", enc["pos_embed"])
    put("model.encoder.layer_norm.weight", enc["ln_post"]["scale"])
    put("model.encoder.layer_norm.bias", enc["ln_post"]["bias"])

    def unstack(part, prefix, attn_names):
        L = part["self_attn"]["q"]["w"].shape[0]
        for i in range(L):
            for hf_attn, ours in attn_names:
                blk = part[ours]
                for hf_p, op in (
                    ("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "out")
                ):
                    put(f"{prefix}.{i}.{hf_attn}.{hf_p}.weight", blk[op]["w"][i].T)
                    if "b" in blk[op]:
                        put(f"{prefix}.{i}.{hf_attn}.{hf_p}.bias", blk[op]["b"][i])
            ln_names = [("self_attn_layer_norm", "self_attn_ln"),
                        ("final_layer_norm", "final_ln")]
            if ("encoder_attn", "cross_attn") in attn_names:
                ln_names.insert(1, ("encoder_attn_layer_norm", "cross_attn_ln"))
            for hf_ln, ours_ln in ln_names:
                put(f"{prefix}.{i}.{hf_ln}.weight", part[ours_ln]["scale"][i])
                put(f"{prefix}.{i}.{hf_ln}.bias", part[ours_ln]["bias"][i])
            for fc in ("fc1", "fc2"):
                put(f"{prefix}.{i}.{fc}.weight", part[fc]["w"][i].T)
                put(f"{prefix}.{i}.{fc}.bias", part[fc]["b"][i])

    unstack(enc["layers"], "model.encoder.layers", [("self_attn", "self_attn")])
    unstack(
        dec["layers"],
        "model.decoder.layers",
        [("self_attn", "self_attn"), ("encoder_attn", "cross_attn")],
    )
    put("model.decoder.embed_tokens.weight", dec["token_embed"])
    put("model.decoder.embed_positions.weight", dec["pos_embed"])
    put("model.decoder.layer_norm.weight", dec["ln"]["scale"])
    put("model.decoder.layer_norm.bias", dec["ln"]["bias"])
    put("proj_out.weight", dec["token_embed"])  # tied
    return sd


# ----------------------------------------------------------------------
# npz round-trip (native checkpoint-free save/load used by CLIs/tests)
# ----------------------------------------------------------------------

def save_npz(path: str, params: Params) -> None:
    import jax

    flat = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, leaf in leaves_with_path:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_npz(path: str) -> Params:
    data = np.load(path)
    tree: Params = {}
    for name in data.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[name]
    return tree
