"""Checkpointing (orbax-backed).

Capability match for the reference's ``DetectionCheckpointer`` + fvcore
``Checkpointer``/``PeriodicCheckpointer`` (checkpoint/detection_checkpoint.py:11,
engine/hooks.py:177): save/load model+optimizer+iteration, a
``last_checkpoint`` pointer file, ``resume_or_load`` semantics, and periodic
saves from the training loop.  The payload is the whole ``TrainState`` pytree
(params / batch_stats / opt_state / step) — orbax handles sharded arrays and
multi-host coordination natively, replacing torch.save + manual rank gating.

Weight-only import from reference torch checkpoints (.pth) lives in
``torch_import.py`` and is dispatched here by file extension, mirroring how the
reference dispatches .pkl Caffe2 payloads (detection_checkpoint.py:26-73).
"""

import logging
import os
from typing import Any, List, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["Checkpointer", "DetectionCheckpointer", "PeriodicCheckpointer"]


class Checkpointer:
    def __init__(self, state: Any, save_dir: str = "", *, save_to_disk: bool = True) -> None:
        import orbax.checkpoint as ocp

        self._ckpt = ocp.PyTreeCheckpointer()
        self.state = state
        self.save_dir = os.path.abspath(save_dir) if save_dir else ""
        self.save_to_disk = save_to_disk and bool(save_dir)

    # -- save ----------------------------------------------------------------
    def save(self, name: str) -> None:
        if not self.save_to_disk:
            return
        path = os.path.join(self.save_dir, name)
        logger.info("Saving checkpoint to %s", path)
        self._ckpt.save(path, jax.tree_util.tree_map(np.asarray, self.state), force=True)
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(name)

    # -- load ----------------------------------------------------------------
    def load(self, path: str, weights_only: bool = False) -> Any:
        """Load ``path`` into (a copy of) the tracked state and return it."""
        if not path:
            logger.info("No checkpoint given; using random initialization.")
            return self.state
        if path.endswith((".pth", ".pkl")):
            from .torch_import import load_torch_weights

            self.state = load_torch_weights(path, self.state)
            return self.state
        logger.info("Loading checkpoint from %s", path)
        template = jax.tree_util.tree_map(np.asarray, self.state)
        restored = self._ckpt.restore(path, item=template)
        if weights_only and hasattr(restored, "replace") and hasattr(self.state, "step"):
            # Reference load-weights-only fine-tune semantics
            # (engine/defaults.py:303-319): take params/batch_stats from the
            # checkpoint but keep the fresh step/opt_state so the LR schedule
            # starts from iteration 0 instead of silently resuming mid-run.
            restored = self.state.replace(
                params=restored.params, batch_stats=restored.batch_stats
            )
        self.state = restored
        return self.state

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> str:
        try:
            with open(os.path.join(self.save_dir, "last_checkpoint")) as f:
                return os.path.join(self.save_dir, f.read().strip())
        except OSError:
            return ""

    def get_all_checkpoint_files(self) -> List[str]:
        if not self.save_dir or not os.path.isdir(self.save_dir):
            return []
        return [
            os.path.join(self.save_dir, f)
            for f in os.listdir(self.save_dir)
            if os.path.isdir(os.path.join(self.save_dir, f)) and f.startswith("model_")
        ]

    def resume_or_load(self, path: str, *, resume: bool = True) -> Any:
        """Reference engine/defaults.py:303-319 semantics: resume from the
        latest checkpoint if one exists, else load ``path`` weights-only."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file())
        return self.load(path, weights_only=True)


class DetectionCheckpointer(Checkpointer):
    """Alias kept for API parity with the reference."""


class PeriodicCheckpointer:
    """Save every ``period`` iterations + at the end (reference
    fvcore PeriodicCheckpointer via hooks.py:177-193)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: Optional[int] = None) -> None:
        self.checkpointer = checkpointer
        self.period = int(period)
        self.max_iter = max_iter

    def step(self, iteration: int, state: Optional[Any] = None) -> None:
        if state is not None:
            self.checkpointer.state = state
        iteration = int(iteration)
        if self.period > 0 and (iteration + 1) % self.period == 0:
            self.checkpointer.save(f"model_{iteration:07d}")
        if self.max_iter is not None and iteration >= self.max_iter - 1:
            self.checkpointer.save("model_final")

    def save(self, name: str, state: Optional[Any] = None) -> None:
        if state is not None:
            self.checkpointer.state = state
        self.checkpointer.save(name)
