"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL stack (SURVEY.md §2.5):
DDPSharded/DeepSpeed ZeRO-2 (`main/utils_train.py:125-136`,
`main/trainer.py:149-156`) and the rank-sharded inference wrapper
(`scripts/evaluation/ddp_wrapper.py`). Instead of translating process
groups, we declare a 2-D mesh:

  * `data` — batch parallelism (grad psum rides ICI); optimizer state is
    sharded over this axis (ZeRO-equivalent) via a param partition rule.
  * `model` — optional tensor parallelism for the big attention/FF matmuls;
    GSPMD inserts the all-gather/reduce-scatter pairs.

The same mesh serves batched multi-chip inference: shard the clip batch
over `data` and leave params replicated (or TP-sharded on `model`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def param_partition_spec(path: tuple, leaf, mesh: Mesh,
                         zero_shard: bool = True) -> P:
    """Partition rule for one parameter.

    * 2-D kernels of attention/FF projections: shard the output features
      over 'model' (tensor parallel) when divisible.
    * everything else: with zero_shard, shard the largest axis over 'data'
      when cleanly divisible (ZeRO-3-style parameter sharding); otherwise
      replicate.
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    shape = getattr(leaf, "shape", ())
    name = path[-1] if path else ""

    if name == "kernel" and len(shape) == 2 and n_model > 1:
        if shape[1] % n_model == 0:
            return P(None, "model")
    if zero_shard and len(shape) >= 1 and n_data > 1:
        axis = int(np.argmax(shape))
        if shape[axis] % n_data == 0 and np.prod(shape) >= 1 << 16:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh, zero_shard: bool = True):
    """Apply the partition rule to a parameter tree -> NamedSharding tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path_leaf):
        path, leaf = path_leaf
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        return NamedSharding(mesh, param_partition_spec(keys, leaf, mesh,
                                                        zero_shard))

    specs = [spec_for(pl) for pl in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
