"""Training loop: step scheduling, eval, gated checkpointing, logging.

TPU-native replacement for the reference's HF `Seq2SeqTrainer` usage
(`finetune.py:269-282`): the hot loop is one jitted train step fed by the
prefetching DataLoader; evaluation runs every `eval_steps`; checkpoints are
Orbax, gated on best eval loss (parity with `utils/callback.py:11-32`);
resume restores adapters + optimizer state only (`finetune.py:279`
semantics). Logging goes to stdout + a metrics.jsonl file (+ TensorBoard via
tf.summary when available — reference `finetune.py:243`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from neuspeech1_tpu.train import trainstep as ts
from neuspeech1_tpu.train.checkpoint import CheckpointManager


class Trainer:
    def __init__(
        self,
        config,
        stem,
        tx,
        state: ts.TrainState,
        frozen,
        train_loader,
        eval_loader=None,
        output_dir: str = "output",
        max_steps: Optional[int] = None,
        num_epochs: Optional[int] = None,
        eval_steps: int = 1000,
        save_steps: int = 1000,
        logging_steps: int = 100,
        max_to_keep: int = 5,
        best_only_save: bool = True,
        augment_config: Optional[dict] = None,
        orth_reg_weight: float = 0.0,
        adalora: Optional[dict] = None,
        tensorboard: bool = False,
        batch_transform: Optional[Callable] = None,
        fold_lora: bool = False,
        int8_matmul: str = "off",
        generate_eval_tokenizer=None,
        generate_eval_max_new: int = 48,
        generate_eval_language: Optional[str] = "english",
        generate_eval_task: str = "transcribe",
    ):
        self.config = config
        self.stem = stem
        self.tx = tx
        self.state = state
        self.frozen = frozen
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.output_dir = output_dir
        self.max_steps = max_steps
        self.num_epochs = num_epochs
        self.eval_steps = eval_steps
        self.save_steps = save_steps
        self.logging_steps = logging_steps
        self.augment_config = augment_config
        self.adalora = adalora
        self.batch_transform = batch_transform
        os.makedirs(output_dir, exist_ok=True)
        self.ckpt = CheckpointManager(
            os.path.join(output_dir, "checkpoints"),
            max_to_keep=max_to_keep,
            best_only=best_only_save,
        )
        adalora_total = (adalora or {}).get(
            "total_steps", max_steps or 10_000
        )
        self.train_step = ts.make_train_step(
            config, stem, tx, orth_reg_weight=orth_reg_weight,
            augment_config=augment_config,
            track_adalora_importance=bool(adalora),
            fold_lora=fold_lora,
            int8_matmul=int8_matmul,
            adalora_ipt_stop_step=(
                adalora_total - (adalora or {}).get("tfinal", 1000)
                if adalora else None
            ),
        )
        self.eval_step = ts.make_eval_step(config, stem)
        self._log_file = open(
            os.path.join(output_dir, "metrics.jsonl"), "a", encoding="utf-8"
        )
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(output_dir, "tb")
                )
            except Exception:
                self._tb = None
        self._last_eval_loss: Optional[float] = None
        self._eval_batch_size: Optional[int] = None
        self._adalora_pattern = None  # frozen rank pattern (final phase)
        self._gen_tok = generate_eval_tokenizer
        self._gen_max_new = generate_eval_max_new
        self._gen_lang = generate_eval_language
        self._gen_task = generate_eval_task

    # ------------------------------------------------------------------
    def log(self, record: Dict[str, Any]):
        record = {
            k: (float(v) if isinstance(v, (int, float, np.floating)) or hasattr(v, "item") else v)
            for k, v in record.items()
        }
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()
        step = record.get("step", 0)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in record.items():
                    if isinstance(v, float) and k != "step":
                        tf.summary.scalar(k, v, step=int(step))
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(f"[train] {msg}", flush=True)

    # ------------------------------------------------------------------
    def _pad_batch(self, batch):
        """Pad a partial final batch up to the loader batch size so the
        jitted eval/decode programs see ONE static shape (a fresh compile
        costs minutes through the remote-compile tunnel). Padded label rows
        are all -100 so they contribute zero tokens to masked losses.
        Returns (batch, true_rows)."""
        bsz = next(iter(batch.values())).shape[0]
        if self._eval_batch_size is None:
            self._eval_batch_size = bsz
        want = self._eval_batch_size
        if bsz >= want:
            return batch, bsz
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            pad = np.repeat(v[-1:], want - bsz, axis=0)
            if k == "labels":
                pad = np.full_like(pad, -100)
            out[k] = np.concatenate([v, pad], axis=0)
        return out, bsz

    def evaluate(self) -> float:
        if self.eval_loader is None:
            return float("nan")
        total, n = 0.0, 0
        for batch in self.eval_loader:
            batch, _ = self._pad_batch(batch)
            batch = self._prep(batch)
            out = self.eval_step(self.state.trainable, self.frozen, batch)
            toks = int(out["n_tokens"])
            total += float(out["loss"]) * toks
            n += toks
        if n == 0:
            return float("nan")  # empty eval set must not look like loss 0
        return total / n

    def evaluate_generate(self) -> Dict[str, float]:
        """Greedy-decode the eval set and score WER/BLEU-1 — the
        predict_with_generate-style metric loop the reference defers to its
        separate evaluation.py CLI."""
        if self.eval_loader is None or self._gen_tok is None:
            return {}
        import jax.numpy as jnp
        import numpy as np

        from neuspeech1_tpu.decode.generate import (
            GenerationConfig, greedy_decode,
        )
        from neuspeech1_tpu.metrics.battery import compute_battery

        tok = self._gen_tok
        params, lora = ts.model_params_of(self.state, self.frozen)
        prompt = np.asarray(
            [tok.prefix_tokens(self._gen_lang, self._gen_task)], np.int32)
        gen = GenerationConfig.for_model(
            self.config, max_length=prompt.shape[1] + self._gen_max_new
        )
        preds, refs = [], []
        for batch in self.eval_loader:
            batch, true_rows = self._pad_batch(batch)
            feats = np.asarray(batch["input_features"])
            labels = np.asarray(batch["labels"])[:true_rows]
            bp = np.repeat(prompt, feats.shape[0], axis=0)
            # compact model-dtype upload (exact; cli/common.upload_features)
            # — eval-WER decode otherwise re-uploads f32 full-pad features
            # every eval at the tunnel's ~45 MB/s
            from neuspeech1_tpu.cli.common import upload_features

            out = np.asarray(greedy_decode(
                params,
                upload_features(feats, jnp.dtype(self.config.dtype)),
                bp, self.config, self.stem, gen,
                lora=lora,
            ))[:true_rows]
            preds.extend(tok.batch_decode(out))
            refs.extend(tok.decode(l) for l in labels)
        m = compute_battery(preds, refs, include_cer=False)
        return {"eval_wer": m["wer"], "eval_bleu1": m["bleu-1"]}

    def _prep(self, batch):
        import jax.numpy as jnp

        batch = {
            k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")
        }
        if self.batch_transform is not None:
            batch = self.batch_transform(batch)
        return batch

    # ------------------------------------------------------------------
    def train(self, resume_from_checkpoint=False):
        """``resume_from_checkpoint``: False/None = fresh, True = latest
        saved step, an int (or digit string) = that specific step — the
        analog of the reference's checkpoint-path argument
        (`finetune.py:53,281`). Identity (not truthiness) check so a
        step-0 checkpoint resumes instead of silently starting fresh."""
        if resume_from_checkpoint is not False and \
                resume_from_checkpoint is not None:
            step = None
            if not isinstance(resume_from_checkpoint, bool):
                step = int(resume_from_checkpoint)
            restored = self.ckpt.restore_latest(self.state, step=step)
            if restored is not None:
                self.state = restored
                print(
                    f"[train] resumed from step {int(jax.device_get(self.state.step))}",
                    flush=True,
                )

        step_num = int(jax.device_get(self.state.step))
        t_last = time.perf_counter()
        samples_since = 0
        epoch = 0
        done = False
        while not done:
            if self.num_epochs is not None and epoch >= self.num_epochs:
                break
            for batch in self.train_loader:
                bsz = next(iter(batch.values())).shape[0]
                batch = self._prep(batch)
                self.state, metrics = self.train_step(
                    self.state, self.frozen, batch
                )
                step_num += 1
                samples_since += bsz

                if self.adalora:
                    # ipt EMAs update inside the jitted step; allocation
                    # follows PEFT budget_schedule (mask_ind) exactly
                    self._adalora_update(step_num)

                if step_num % self.logging_steps == 0:
                    # fetch loss FIRST: it synchronizes all queued steps so
                    # the wall clock reflects real work (async dispatch would
                    # otherwise wildly inflate samples/sec)
                    loss_val = float(metrics["loss"])
                    grad_val = float(metrics["grad_norm"])
                    dt = time.perf_counter() - t_last
                    self.log(
                        {
                            "step": step_num,
                            "loss": loss_val,
                            "grad_norm": grad_val,
                            "samples_per_sec": samples_since / max(dt, 1e-9),
                            "epoch": epoch,
                        }
                    )
                    t_last = time.perf_counter()
                    samples_since = 0

                if self.eval_loader is not None and step_num % self.eval_steps == 0:
                    self._last_eval_loss = self.evaluate()
                    rec = {"step": step_num, "eval_loss": self._last_eval_loss}
                    rec.update(self.evaluate_generate())
                    self.log(rec)

                # save schedule is independent of the eval schedule (HF
                # Trainer saves at every save_steps; gating uses the most
                # recent eval_loss — ADVICE r1: save_steps=500/eval_steps=1000
                # must not silently skip the 500-boundary saves)
                if step_num % self.save_steps == 0:
                    if self.eval_loader is not None:
                        if self._last_eval_loss is None:
                            # no eval has run yet this session: measure one
                            # so best-gating has a real number to gate on
                            self._last_eval_loss = self.evaluate()
                        saved = self.ckpt.save(
                            self.state, eval_loss=self._last_eval_loss
                        )
                        if saved:
                            self.log({"step": step_num, "saved": 1,
                                      "best_eval": self.ckpt.best_eval})
                    else:
                        self.ckpt.save(self.state, force=True)

                if self.max_steps is not None and step_num >= self.max_steps:
                    done = True
                    break
            epoch += 1

        # final save (reference `finetune.py:282` checkpoint-final)
        self.ckpt.save(self.state, force=True)
        self.ckpt.wait()
        return self.state

    # ------------------------------------------------------------------
    def _adalora_update(self, step_num: int):
        """PEFT `update_and_allocate`: budget_schedule decides when to mask;
        masking zeroes lora_E below the global importance threshold."""
        from neuspeech1_tpu.models.lora import (
            adalora_budget_schedule,
            adalora_mask_to_budget,
            adalora_total_ranks,
            adalora_triplet_scores,
        )

        lora = self.state.trainable.get("lora")
        if not lora or not self.state.ipt:
            return
        cfg = self.adalora
        init_bgt = adalora_total_ranks(lora)
        # matrix count comes from the tree itself — inferring it from the
        # config's init_r breaks when the adapters were initialized with a
        # different rank (budget would mis-scale and over/under-prune)
        from neuspeech1_tpu.models.lora import adalora_matrix_count

        n_matrices = max(adalora_matrix_count(lora), 1)
        total = cfg.get("total_steps", self.max_steps or 10_000)
        tfinal = cfg.get("tfinal", 1000)
        budget, mask_ind = adalora_budget_schedule(
            step_num,
            init_bgt,
            cfg.get("target_r", 4) * n_matrices,
            cfg.get("tinit", 200),
            tfinal,
            total,
            cfg.get("deltaT", 10),
        )
        # PEFT force-masks at the boundary step (AdaLoraModel
        # update_and_allocate force_mask=True at total_step - tfinal); in
        # the final phase the pattern is FROZEN and only re-applied each
        # step (mask_using_rank_pattern: pruned-rank E entries keep
        # receiving gradients and must be re-zeroed) — no score recompute,
        # no global sort.
        import dataclasses

        from neuspeech1_tpu.models.lora import (
            adalora_apply_pattern, adalora_pattern_of,
        )

        if step_num > total - tfinal and self._adalora_pattern is not None:
            new_lora = adalora_apply_pattern(lora, self._adalora_pattern)
        elif mask_ind or step_num == total - tfinal:
            scores = adalora_triplet_scores(self.state.ipt)
            new_lora = adalora_mask_to_budget(lora, scores, budget, init_bgt)
            if step_num >= total - tfinal:
                # host-side snapshot: the live arrays get donated by the
                # next jitted step and would be invalid buffers by then
                self._adalora_pattern = jax.tree_util.tree_map(
                    np.asarray, adalora_pattern_of(new_lora)
                )
        else:
            return
        self.state = dataclasses.replace(
            self.state,
            trainable={**self.state.trainable, "lora": new_lora},
        )
