"""High-level inference API: load a full model, transcribe brain signals.

The reference exposes inference only through the evaluation CLI; this is the
library-user entry point a production deployment would import:

    from neuspeech1_tpu.serve import Transcriber
    t = Transcriber("runs/gwilliams_base/full_model", tokenizer="byte")
    texts = t.transcribe(signals)            # [B, ch, T] numpy
    rows = t.transcribe_with_timestamps(signals[0:1])

Decode compiles once per (batch, prompt) shape; inputs are padded to the
configured batch size so repeated calls reuse the compiled program.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from neuspeech1_tpu.config import SIGNAL_SAMPLE_RATE, StemConfig, WhisperConfig


def _resolve_decode_buckets(mode: str, num_beams: int, max_length: int):
    """'auto': length-bucket the decode loops when max_length is large —
    per-step decode cost scales with the fixed buffer length (3.34
    ms/token at Tmax=448 vs 1.73 at Tmax~52, whisper-base bs64 greedy), so
    short utterances decoded under a big max_length otherwise pay the
    big-buffer rate the whole way. Applies to greedy, sampling, AND beam
    search (each chains per-bucket while_loops inside one jit). 'off'
    disables; a comma-separated int list pins explicit buckets."""
    if mode == "off":
        return ()
    if mode == "auto":
        return tuple(x for x in (64, 128, 256) if x < max_length) \
            if max_length > 96 else ()
    return tuple(int(x) for x in mode.split(","))


class Transcriber:
    def __init__(
        self,
        model_dir: str,
        tokenizer: str = "byte",
        batch_size: int = 8,
        num_beams: int = 1,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        max_new_tokens: int = 128,
        language: Optional[str] = "english",
        task: str = "transcribe",
        int8_weights: bool = False,
        int8_kv_cache: bool = False,
        suppress_tokens: str = "default",
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        sample_seed: int = 0,
        decode_buckets: str = "auto",
        spec_gamma: int = 0,
        spec_draft_from: Optional[str] = None,
    ):
        """``suppress_tokens``: 'default' derives the HF whisper suppress /
        begin-suppress lists from the tokenizer's vocab (what a downloaded
        generation_config.json would carry — no file needed), 'none'
        disables both, or a comma-separated id list."""
        from neuspeech1_tpu import enable_compilation_cache
        from neuspeech1_tpu.cli import common
        from neuspeech1_tpu.decode.generate import GenerationConfig

        enable_compilation_cache()
        params, config, stem = common.load_full_model(model_dir)
        if int8_weights:
            from neuspeech1_tpu.models.quantize import (
                dequantize_params, quantize_params,
            )

            params = dequantize_params(quantize_params(params),
                                       dtype=np.float32)
        # one-time device commit (numpy leaves re-upload per batch call)
        self.params = common.commit_params(params)
        self.config = config
        self.stem = stem
        self.tokenizer = common.resolve_tokenizer(tokenizer, config)
        self.batch_size = batch_size
        self.language = language
        self.task = task
        self.prompt = np.asarray(
            [self.tokenizer.prefix_tokens(language, task)], np.int32
        )
        self.gen = GenerationConfig.for_model(
            config,
            max_length=self.prompt.shape[1] + max_new_tokens,
            num_beams=num_beams,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            int8_kv_cache=int8_kv_cache,
            do_sample=do_sample, temperature=temperature, top_k=top_k,
            top_p=top_p,
            spec_gamma=spec_gamma,
            decode_buckets=_resolve_decode_buckets(
                decode_buckets, num_beams,
                self.prompt.shape[1] + max_new_tokens),
            **common.suppress_kwargs(suppress_tokens, self.tokenizer),
        )
        if spec_gamma >= 2 and (num_beams > 1 or do_sample):
            raise ValueError(
                "spec_gamma only applies to plain greedy decode; unset "
                "num_beams/do_sample or spec_gamma")
        self._sample_seed = sample_seed
        self._draft_table = None
        if spec_draft_from:
            # corpus n-gram drafter tables for --spec_gamma (train-jsonl
            # text — the same source the sequence-bias builder mines)
            import jax.numpy as _jnp

            from neuspeech1_tpu.data.manifest import read_jsonlines
            from neuspeech1_tpu.decode.spec import build_draft_table

            texts = [r["sentence"] for r in read_jsonlines(spec_draft_from)]
            tbl = build_draft_table(texts, self.tokenizer, config.vocab_size)
            self._draft_table = {k: _jnp.asarray(v) for k, v in tbl.items()}

    # ------------------------------------------------------------------
    @property
    def expected_samples(self) -> int:
        return self.config.max_source_positions * 4

    def _prepare(self, signals: np.ndarray) -> np.ndarray:
        """[B, ch, T] -> clipped/padded to the model's input geometry."""
        signals = np.asarray(signals, np.float32)
        if signals.ndim == 2:
            signals = signals[None]
        b, ch, t = signals.shape
        need_ch = self.stem.in_channels
        if ch > need_ch:
            signals = signals[:, :need_ch]
        elif ch < need_ch:
            signals = np.pad(signals, ((0, 0), (0, need_ch - ch), (0, 0)))
        n = self.expected_samples
        signals = signals[:, :, :n]
        if signals.shape[-1] < n:
            signals = np.pad(
                signals, ((0, 0), (0, 0), (0, n - signals.shape[-1]))
            )
        return signals

    def transcribe(self, signals: np.ndarray) -> List[str]:
        """Batched decode; pads to `batch_size` internally (one compile)."""
        import jax.numpy as jnp

        from neuspeech1_tpu.decode.generate import generate

        signals = self._prepare(signals)
        out_texts: List[str] = []
        bs = self.batch_size
        sample_rng = None
        if self.gen.do_sample:
            import jax

            sample_rng = jax.random.key(self._sample_seed)
        from neuspeech1_tpu.cli import common

        for i in range(0, signals.shape[0], bs):
            chunk = signals[i : i + bs]
            n = chunk.shape[0]
            if n < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - n, axis=0)], axis=0
                )
            prompt = np.repeat(self.prompt, bs, axis=0)
            # model-dtype + zero-tail-cropped upload (exact; cli/common.py
            # upload_features — the tunnel moves ~45 MB/s, so the full-pad
            # f32 upload dominated the batch wall otherwise)
            chunk_dev = common.upload_features(chunk, jnp.dtype(
                self.config.dtype))
            out = np.asarray(
                generate(self.params, chunk_dev, prompt, self.config,
                         self.stem, self.gen, rng=sample_rng,
                         draft_table=self._draft_table)
            )
            out_texts.extend(self.tokenizer.batch_decode(out[:n]))
        return out_texts

    def transcribe_with_timestamps(self, signals: np.ndarray) -> List[List[dict]]:
        """Per-token start/end times via cross-attention DTW (offline path)."""
        import dataclasses

        import jax.numpy as jnp

        from neuspeech1_tpu.decode.generate import greedy_decode
        from neuspeech1_tpu.decode.timestamps import word_timestamps

        from neuspeech1_tpu.cli import common

        signals = self._prepare(signals)
        gen = dataclasses.replace(self.gen, num_beams=1)
        rows: List[List[dict]] = []
        for i in range(signals.shape[0]):
            feats = common.upload_features(
                signals[i : i + 1], jnp.dtype(self.config.dtype))
            prompt = self.prompt
            out = np.asarray(
                greedy_decode(self.params, feats, prompt,
                              self.config, self.stem, gen)
            )[0]
            # trim at eot
            toks = []
            for t in out:
                toks.append(int(t))
                if t == self.config.eot_id and len(toks) > prompt.shape[1]:
                    break
            rows.append(
                word_timestamps(self.params, feats, toks,
                                self.config, self.stem, self.tokenizer)
            )
        return rows
