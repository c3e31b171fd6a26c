"""Checkpoint persistence: orbax save/load of parameter pytrees + training state.

Replaces the reference's per-epoch torch.save(state_dict) flow
(AVE/traintest_adapt_ave29.py:225-229) and adds the mid-training resume the
reference lacks (SURVEY.md §5: "No mid-training resume path").
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, state: Any):
    """Save a pytree (params or full train state) to `path` (a directory)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    else:  # flat-npz fallback
        from .torch_convert import flatten_params
        flat = {k: np.asarray(v) for k, v in flatten_params(state).items()}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path + ".npz", **flat)


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a pytree saved by save_checkpoint; `like` provides structure/shapes."""
    path = os.path.abspath(path)
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, like)
    from .torch_convert import flatten_params, set_by_path
    data = np.load(path + ".npz" if not path.endswith(".npz") else path)
    for k in flatten_params(like):
        set_by_path(like, k, jax.numpy.asarray(data[k]))
    return like
