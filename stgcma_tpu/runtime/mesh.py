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


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Multi-host bring-up: call jax.distributed.initialize() from explicit
    args or the environment, before any device access.

    Sources (first hit wins per field):
      1. explicit arguments,
      2. STGCMA_COORDINATOR / STGCMA_NUM_PROCESSES / STGCMA_PROCESS_ID,
      3. cluster auto-detection (SLURM/GKE/etc.) via bare
         jax.distributed.initialize() when STGCMA_DISTRIBUTED=1.

    Returns True if distributed mode was initialized, False for the
    single-process fallback (no env, no args). Safe to call twice (no-op if
    the client is already up). Replaces the reference's nn.DataParallel
    single-host scatter/gather (SURVEY §2.12) with a multi-controller SPMD
    runtime: after this, make_mesh() sees every process's devices and the
    same jit-ted train step runs on all hosts with XLA collectives over
    ICI/DCN.
    """
    import os

    try:  # no-op if a distributed client is already up
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return True
    except Exception:
        pass
    coordinator = coordinator or os.environ.get("STGCMA_COORDINATOR")
    num_processes = num_processes if num_processes is not None else \
        _int_env("STGCMA_NUM_PROCESSES")
    process_id = process_id if process_id is not None else \
        _int_env("STGCMA_PROCESS_ID")
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
        return True
    if os.environ.get("STGCMA_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # cluster auto-detection
        return True
    return False


def _int_env(name: str):
    import os
    v = os.environ.get(name)
    return int(v) if v is not None else None


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
