"""Checkpointing with keep-N cleanup and partial restore.

Mirrors the reference's save/load semantics (mainFeatureLearning.py:
229-282): numbered checkpoints `checkpoint_%04d`, only the most recent
`keep` retained, and restore-by-key-filtering so a checkpoint with extra /
missing entries still partially loads.  Backed by orbax.
"""

from __future__ import annotations

import os
import re
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint_{step:04d}")

    def all_steps(self):
        steps = []
        for p in os.listdir(self.directory):
            m = re.fullmatch(r"checkpoint_(\d+)", p)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def save(self, step: int, state):
        state = jax.tree.map(np.asarray, jax.device_get(state))
        path = self._path(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        # keep-N cleanup (mainFeatureLearning.py:240-256)
        steps = self.all_steps()
        for s in steps[: max(0, len(steps) - self.keep)]:
            shutil.rmtree(self._path(s), ignore_errors=True)
        return path

    def restore(self, step: int = None):
        steps = self.all_steps()
        if not steps:
            return None
        step = steps[-1] if step is None else step
        return self._ckptr.restore(self._path(step))

    def restore_into(self, template_state, step: int = None):
        """Partial restore: only keys present in BOTH the checkpoint and the
        template are taken from the checkpoint (mainFeatureLearning.py:
        269-275's filter-and-update)."""
        loaded = self.restore(step)
        if loaded is None:
            return template_state, False

        def merge(tpl, new):
            if isinstance(tpl, dict):
                out = {}
                for k, v in tpl.items():
                    if isinstance(new, dict) and k in new:
                        out[k] = merge(v, new[k])
                    else:
                        out[k] = v
                return out
            if isinstance(tpl, tuple) and hasattr(tpl, "_fields"):
                # namedtuple (optax sub-states): orbax restores these as
                # dicts keyed by field name
                if isinstance(new, dict):
                    return type(tpl)(*[
                        merge(getattr(tpl, fld), new[fld])
                        if fld in new else getattr(tpl, fld)
                        for fld in tpl._fields])
                if isinstance(new, (list, tuple)) and len(new) == len(tpl):
                    return type(tpl)(*[merge(t, n)
                                       for t, n in zip(tpl, new)])
                return tpl
            if isinstance(tpl, (list, tuple)):
                # plain tuples restore as lists — recurse element-wise,
                # keep the template's container type
                if isinstance(new, (list, tuple)) and len(new) == len(tpl):
                    merged = [merge(t, n) for t, n in zip(tpl, new)]
                    return tuple(merged) if isinstance(tpl, tuple) else merged
                return tpl
            try:
                same = new is not None and np.shape(new) == np.shape(tpl)
            except ValueError:  # ragged container leaf — shapes undefined
                same = False
            return new if same else tpl

        return merge(template_state, loaded), True
