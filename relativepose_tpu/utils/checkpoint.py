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


def save_params_npz(path: str, params, dtype=np.float16) -> str:
    """Export a params pytree as one compressed npz ('/'-joined keys).

    A portable, git-committable weight artifact (~2 bytes/param at f16):
    round 3's trained checkpoints lived only in experiments/ and were lost
    with the machine — shipped weights now live in
    relativepose_tpu/data/pretrained/ (the reference ships torch
    .pth.tar checkpoints the same way, evaluation.py:143-150)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            arr = np.asarray(jax.device_get(node))
            flat[prefix] = arr.astype(dtype) if np.issubdtype(
                arr.dtype, np.floating) else arr

    walk("", params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_params_npz(path: str, dtype=np.float32):
    """Inverse of save_params_npz -> nested dict pytree (floats as
    `dtype`)."""
    out = {}
    with np.load(path) as z:
        for key in z.files:
            arr = z[key]
            if np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return out


def restore_params(path: str):
    """Load completion/feature params from either an orbax checkpoint dir
    (returns the saved state dict) or a .npz weight artifact (returns
    {'params': pytree}) — the common currency of the eval/train CLIs."""
    if path.endswith(".npz"):
        return {"params": load_params_npz(path)}
    state = CheckpointManager(path).restore()
    if state is None:
        raise FileNotFoundError(path)
    return state


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
