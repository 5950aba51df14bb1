"""Device-mesh parallelism for training and evaluation.

The reference's only multi-device story is `torch.nn.DataParallel` over 2
GPUs (mainPanoCompletion2view.py:154-156) plus manual eval sharding
(`--entrySplit`).  The TPU-native equivalent:

  * a `jax.sharding.Mesh` over ('data', 'model') axes;
  * batches sharded over 'data' (pure data parallelism rides ICI; XLA
    inserts the gradient all-reduce);
  * optionally, large parameters sharded over 'model' (tensor parallelism
    for the widest SCNet trunk convs — XLA inserts the activation
    collectives).  At ResNet-18/SCNet scale, dp is the win; tp is provided
    for completeness and exercised by the multi-chip dry run.

All helpers work identically on real TPU meshes and on the virtual
8-device CPU mesh used by the tests.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (data = n/model_parallel, model = model_parallel)."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for a batch pytree."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def param_sharding(params, mesh: Mesh, min_shard_size: int = 256):
    """Tensor-parallel sharding rule: shard the trailing (output-channel)
    axis of large kernels over 'model'; replicate everything else."""
    m = mesh.shape["model"]

    def spec(x):
        if (x.ndim >= 2 and x.shape[-1] % m == 0
                and x.shape[-1] >= min_shard_size):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_train_state(state, mesh: Mesh, tensor_parallel: bool = True):
    """Place a train-state dict on the mesh: params (and matching optimizer
    moments) tensor-sharded when enabled, everything else replicated."""
    if not tensor_parallel or mesh.shape["model"] == 1:
        return replicate(state, mesh)
    p_sh = param_sharding(state["params"], mesh)

    def put_like(tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), tree, p_sh)

    out = dict(state)
    out["params"] = put_like(state["params"])
    new_opt = []
    for part in state["opt_state"]:
        fields = getattr(part, "_fields", None)
        if fields and "mu" in fields and "nu" in fields:
            part = part._replace(mu=put_like(part.mu), nu=put_like(part.nu))
        else:
            part = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), part)
        new_opt.append(part)
    out["opt_state"] = tuple(new_opt)
    if "net_f_params" in out:
        out["net_f_params"] = replicate(out["net_f_params"], mesh)
    out["step"] = jax.device_put(out["step"], NamedSharding(mesh, P()))
    return out


def pad_batch_to(batch, multiple: int):
    """Pad the leading axis of every array so it divides the data axis."""

    def pad(x):
        if getattr(x, "ndim", 0) == 0:
            return x
        n = x.shape[0]
        p = (-n) % multiple
        if p == 0:
            return x
        widths = [(0, p)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return jax.tree.map(pad, batch)
