"""Experiment directory conventions + resume semantics.

Mirrors utils/train_op.py:105-194: every run lives in
`experiments/exp_<name>/` with `samples/`, `params/`, and a csv log; `rm`
wipes a previous run of the same name, `resume` requires one; the latest
checkpoint is discovered by number (train_op.py:57-62).
"""

from __future__ import annotations

import glob
import os
import re
import shutil


class ExperimentDirs:
    def __init__(self, name: str, root: str = "experiments",
                 rm: bool = False, resume: bool = False):
        self.name = name
        self.exp_dir = os.path.join(root, f"exp_{name}")
        self.samples_dir = os.path.join(self.exp_dir, "samples")
        self.params_dir = os.path.join(self.exp_dir, "params")
        self.csv_path = os.path.join(self.exp_dir, f"exp_{name}.csv")
        self.log_path = os.path.join(self.exp_dir, f"exp_{name}.log")
        exists = os.path.exists(self.exp_dir)
        if rm and exists:
            shutil.rmtree(self.exp_dir)
            exists = False
        if resume and not exists:
            raise FileNotFoundError(
                f"--resume requires existing experiment {self.exp_dir}")
        has_params = os.path.isdir(self.params_dir) and bool(
            os.listdir(self.params_dir))
        if not resume and exists and has_params:
            raise FileExistsError(
                f"experiment {self.exp_dir} exists; pass rm=True or "
                f"resume=True (train_op.py:156-194 semantics)")
        for d in (self.exp_dir, self.samples_dir, self.params_dir):
            os.makedirs(d, exist_ok=True)

    def latest_checkpoint(self):
        """Newest checkpoint dir/file by numeric suffix
        (train_op.py:57-62)."""
        cands = glob.glob(os.path.join(self.params_dir, "checkpoint_*"))
        if not cands:
            return None

        def num(p):
            m = re.findall(r"\d+", os.path.basename(p))
            return int(m[-1]) if m else -1

        return max(cands, key=num)


def parameters_count(params, name: str = "model"):
    """Log total parameter count (train_op.py:87-91)."""
    import jax
    n = sum(int(p.size) for p in jax.tree.leaves(params))
    print(f"{name} #param: {n / 1e6:.2f}M")
    return n
