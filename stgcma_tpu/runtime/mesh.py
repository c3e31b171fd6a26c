"""Device mesh + sharding rules — the distributed-runtime component the reference
lacks entirely (SURVEY.md §2.12: nn.DataParallel only).

Design:
- 2D logical mesh ('data', 'model'): batch sharded over 'data' (replaces
  DataParallel's replicate/scatter/gather with SPMD + XLA all-reduce over ICI),
  Megatron-style tensor parallelism over 'model' for the big backbone matmuls
  (qkv/fc1 column-split, proj/fc2 row-split) — useful for serving Large towers.
- all collectives are emitted by XLA from sharding annotations; no hand comms.
- multi-host: same program after jax.distributed.initialize().
"""
from __future__ import annotations

import re

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


# ---------------------------------------------------------------------------
# parameter sharding rules (Megatron layout for the transformer cores)
# ---------------------------------------------------------------------------

_COL_SPLIT = ("qkv", "fc1", "c_fc", "in_proj", "D_fc1")     # out-dim over 'model'
_ROW_SPLIT = ("proj", "fc2", "c_proj", "out_proj", "D_fc2")  # in-dim over 'model'


def param_spec(path_str: str, leaf) -> P:
    """PartitionSpec for one parameter leaf, by its tree path."""
    if getattr(leaf, "ndim", 0) < 2:
        return P()  # biases, gates, LN, bias tables: replicated
    last = path_str.rsplit("/", 2)
    if "kernel" in path_str and leaf.ndim == 2:
        # identify the owning module name (…/<module>/kernel)
        mod = path_str.split("/")[-2]
        if mod in _COL_SPLIT:
            return P(None, "model")
        if mod in _ROW_SPLIT:
            return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply param_spec over the tree and device_put with NamedShardings."""
    def place(path, leaf):
        s = jax.tree_util.keystr(path)
        s = s.replace("']['", "/").strip("[']").replace("'][", "/").replace("][", "/")
        spec = param_spec(s, leaf)
        # only shard if the dimension is divisible
        mdl = mesh.shape["model"]
        for axis, name in enumerate(spec):
            if name == "model" and leaf.shape[axis] % mdl != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis of every array over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
