"""Tracing / profiling / numerics debugging.

The reference's observability is wall-clock meters (SURVEY.md section 5);
the TPU rebuild makes profiling first-class:

  * `trace(logdir)`: context manager around `jax.profiler` — produces a
    TensorBoard-loadable XLA trace;
  * `StageTimer`: per-stage wall-clock aggregation with block-until-ready
    semantics so device work is attributed to the right stage;
  * `debug_nans(enable)`: toggles jax_debug_nans (the analog of the
    reference's grad-hook NaN printing, utils/torch_op.py:28-32).
"""

from __future__ import annotations

import contextlib
import time

import jax

from relativepose_tpu.utils.log import AverageMeter


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.meters = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.meters.setdefault(name, AverageMeter()).update(
                time.perf_counter() - start)

    def report(self):
        return {k: m.avg for k, m in self.meters.items()}


def debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
