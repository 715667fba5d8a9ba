"""Checkpoint/resume on orbax: resume-newest with corrupted-checkpoint
fallback, plus per-host RNG sidecars for bit-exact resume.

Reference semantics reproduced (iamNCJ/NRHints ``trainer/trainer.py``):
* ``step_XXXXXXX`` checkpoints every N steps (:173-181)
* resume from an explicit path or the newest in the run dir (:193-203)
* fall back to the previous checkpoint if the newest fails to load (:204-207)
* RNG (host sampler streams + the jax key) saved per host and restored
  tolerantly — a failure warns instead of aborting (:209-215); restore is
  skipped when the world size changed (:209).
"""
from __future__ import annotations

import json
import pathlib
import pickle
import re
import warnings
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"step_(\d+)$")


class CheckpointIO:
    def __init__(self, run_dir):
        self.run_dir = pathlib.Path(run_dir)
        self.ckpt_dir = self.run_dir / "ckpt"
        self.rng_dir = self.run_dir / "rng_state"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.rng_dir.mkdir(parents=True, exist_ok=True)
        self._checkpointer = ocp.StandardCheckpointer()

    # -- save ---------------------------------------------------------------

    def save(
        self,
        step: int,
        state,
        rng_sidecar: Optional[dict] = None,
        process_index: Optional[int] = None,
        world_size: Optional[int] = None,
    ) -> None:
        """Save the train-state pytree (coordinated across hosts by orbax)
        plus a per-host RNG pickle."""
        path = self.ckpt_dir / f"step_{step:07d}"
        self._checkpointer.save(path.absolute(), state, force=True)
        self._checkpointer.wait_until_finished()
        if world_size is not None and jax.process_index() == 0:
            (path / "meta.json").write_text(json.dumps({"world_size": world_size}))
        if rng_sidecar is not None:
            rank = jax.process_index() if process_index is None else process_index
            with open(self.rng_dir / f"step_{step:07d}_host_{rank}.pickle", "wb") as f:
                pickle.dump(rng_sidecar, f)

    # -- discovery ----------------------------------------------------------

    def available_steps(self) -> list[int]:
        steps = []
        for p in self.ckpt_dir.iterdir() if self.ckpt_dir.exists() else []:
            m = _STEP_RE.search(p.name)
            if m and p.is_dir():
                steps.append(int(m.group(1)))
        return sorted(steps)

    # -- load ---------------------------------------------------------------

    def load_newest(
        self, abstract_state, explicit_path: Optional[str] = None
    ) -> Tuple[Optional[Any], Optional[int]]:
        """Restore the newest checkpoint (or an explicit path), falling back
        to the previous one if the newest is corrupted.  Returns
        (state, step) or (None, None) when nothing is loadable."""
        if explicit_path is not None:
            candidates = [pathlib.Path(explicit_path)]
        else:
            candidates = [
                self.ckpt_dir / f"step_{s:07d}" for s in reversed(self.available_steps())
            ]
        for i, path in enumerate(candidates):
            try:
                state = self._checkpointer.restore(path.absolute(), abstract_state)
                m = _STEP_RE.search(path.name)
                step = int(m.group(1)) if m else None
                return state, step
            except Exception as e:  # corrupted / partial checkpoint
                if i + 1 < len(candidates):
                    warnings.warn(
                        f"checkpoint {path} failed to load ({e!r}); "
                        f"falling back to {candidates[i + 1]}"
                    )
                    continue
                warnings.warn(f"no loadable checkpoint found (last error: {e!r})")
        return None, None

    def load_rng_sidecar(self, step: int, process_index: Optional[int] = None) -> Optional[dict]:
        rank = jax.process_index() if process_index is None else process_index
        path = self.rng_dir / f"step_{step:07d}_host_{rank}.pickle"
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception as e:
            warnings.warn(
                f"rng state resume failed ({e!r}); results may not be fully reproducible"
            )
            return None

    def load_world_size(self, step: int) -> Optional[int]:
        path = self.ckpt_dir / f"step_{step:07d}" / "meta.json"
        try:
            return int(json.loads(path.read_text())["world_size"])
        except Exception:
            return None
