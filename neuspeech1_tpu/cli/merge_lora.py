"""Merge CLI — fold adapters into base weights -> `full_model/` dir.

Reference `merge_lora.py`: loads base + PEFT adapter, swaps the stem, calls
`merge_and_unload`, saves model+processor to `<lora_dir>/full_model`. Here
the merge is the pure function `models.lora.merge_lora`; the output dir
carries params.npz + config.json (loadable via --model_path in evaluation).
"""

from __future__ import annotations

import argparse
import functools
import os


def build_parser() -> argparse.ArgumentParser:
    from neuspeech1_tpu.utils.args import add_arguments

    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    add_arg("lora_model", str, None, "adapter npz produced by finetune")
    add_arg("base_model", str, "random", "base params (npz/HF dir/'random')")
    add_arg("tokenizer", str, "byte", "'byte' or HF tokenizer dir")
    add_arg("model_size", str, None, "whisper preset: tiny|base|small|medium|large")
    add_arg("stem_kind", str, "base", "projection stem kind")
    add_arg("eeg_ch", int, 208, "signal channels of the stem")
    add_arg("output_dir", str, None, "output dir (default <lora>/full_model)")
    add_arg("export_hf", bool, False, "also write an HF-layout state dict npz")
    for name in ("d_model", "encoder_layers", "decoder_layers", "encoder_heads",
                 "decoder_heads", "encoder_ffn", "decoder_ffn",
                 "max_source_positions", "max_target_positions"):
        add_arg(name, int, None, f"override {name}")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from neuspeech1_tpu.utils.args import print_arguments

    print_arguments(args)
    from neuspeech1_tpu import enable_compilation_cache

    enable_compilation_cache()
    assert args.lora_model and os.path.exists(args.lora_model), (
        f"adapter not found: {args.lora_model}"
    )

    from neuspeech1_tpu.cli import common
    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.models.lora import merge_lora

    config = common.parse_config_overrides(args)
    stem = StemConfig(args.stem_kind, in_channels=args.eeg_ch)
    tokenizer = common.resolve_tokenizer(args.tokenizer, config)
    config = tokenizer.config

    params = common.load_base_params(args.base_model, config, stem)
    adapter = common.load_adapter(args.lora_model)
    params, lora = common.apply_adapter(params, adapter)
    if lora:
        params = merge_lora(params, lora)
        print("[merge_lora] adapters folded into base weights")

    out_dir = args.output_dir or os.path.join(
        os.path.dirname(os.path.abspath(args.lora_model)), "full_model"
    )
    common.save_full_model(out_dir, params, config, stem)
    if args.export_hf:
        import numpy as np

        from neuspeech1_tpu.models.convert import params_to_hf_state_dict

        sd = params_to_hf_state_dict(params, config, stem)
        np.savez(os.path.join(out_dir, "hf_state_dict.npz"), **sd)
    print(f"[merge_lora] full model saved to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
