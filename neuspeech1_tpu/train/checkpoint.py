"""Orbax checkpointing with best-eval gating and resume.

Reference behavior being reproduced (SURVEY §5):
  * step checkpoints with `save_total_limit=5` (`finetune.py:244-246`);
  * `SavePeftModelCallback` gates saving on "latest eval_loss == best so
    far" (`utils/callback.py:12-32`);
  * resume restores adapter weights + optimizer state but deliberately does
    NOT reload base weights (`finetune.py:279` no-ops Trainer's
    `_load_from_checkpoint`) — here the frozen tree simply isn't part of the
    saved state;
  * a final `checkpoint-final` save (`finetune.py:282`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 5,
        best_only: bool = True,
        async_save: bool = True,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_only = best_only
        self.best_eval = float("inf")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)
        self._meta_path = os.path.join(self.directory, "gating.json")
        if os.path.exists(self._meta_path):
            import json

            try:
                self.best_eval = json.load(open(self._meta_path))["best_eval"]
            except Exception:
                pass

    def _to_pytree(self, state) -> Dict[str, Any]:
        return {
            "step": state.step,
            "trainable": state.trainable,
            "opt_state": state.opt_state,
            "rng": state.rng,
        }

    def save(self, state, eval_loss: Optional[float] = None, force: bool = False) -> bool:
        """Save if gating allows. Returns True when a save happened."""
        if eval_loss is not None and eval_loss < self.best_eval:
            self.best_eval = eval_loss
            import json

            with open(self._meta_path, "w") as f:
                json.dump({"best_eval": self.best_eval}, f)
        if self.best_only and not force:
            if eval_loss is None or eval_loss > self.best_eval:
                return False
        step = int(jax.device_get(state.step))
        if step in self.mgr.all_steps():
            return True  # already saved at this step (e.g. final after gated)
        self.mgr.save(
            step,
            args=self._ocp.args.StandardSave(self._to_pytree(state)),
            force=force,
        )
        return True

    def restore_latest(self, state, step=None):
        """Restore into the structure of `state`; returns the restored state
        or None when no checkpoint exists. ``step`` targets a specific saved
        step (the reference resumes from an explicit checkpoint dir,
        `finetune.py:53,281`; here checkpoints are keyed by step)."""
        if step is None:
            step = self.mgr.latest_step()
            if step is None:
                return None
        elif step not in self.mgr.all_steps():
            raise FileNotFoundError(
                f"no checkpoint at step {step}; saved steps: "
                f"{sorted(self.mgr.all_steps())}")
        def abstract(x):
            if not hasattr(x, "dtype"):
                return x
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

        # restore straight onto the source shardings (multi-chip safe)
        target = jax.tree_util.tree_map(abstract, self._to_pytree(state))
        restored = self.mgr.restore(
            step, args=self._ocp.args.StandardRestore(target)
        )
        import dataclasses

        return dataclasses.replace(
            state,
            step=restored["step"],
            trainable=restored["trainable"],
            opt_state=restored["opt_state"],
            rng=restored["rng"],
        )

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
