"""Multi-task batched AV serving: one frozen backbone resident in HBM, per-task
adapter/head pytrees selected per request (BASELINE.json stretch config).

The frozen tower leaves of every task's param tree are aliased to the same
device buffers (`share_frozen_tower`), so serving AVE + AVQA + AVS Large towers
costs one backbone's HBM plus the small adapter/head deltas. Each task gets a
jit-compiled inference fn; requests are dispatched by task name.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from .configs import AVQAHeadConfig, AVSHeadConfig, ClipConfig, SwinConfig
from .models import ave, avqa, avs
from .ops.common import cast_tree
from .train.optim import label_params


def share_frozen_tower(canonical: Dict[str, Any], others: Dict[str, Dict[str, Any]]):
    """Alias every 'frozen'-labeled backbone leaf of each task tree to the
    canonical tree's buffer (same jax.Array object => no extra HBM copy)."""
    canon_by_path = {jax.tree_util.keystr(p): v for p, v in
                     jax.tree_util.tree_flatten_with_path(canonical["backbone"])[0]}
    labels = label_params({"backbone": canonical["backbone"]})

    out = {}
    for name, tree in others.items():
        lab_flat = {jax.tree_util.keystr(p): l for p, l in
                    jax.tree_util.tree_flatten_with_path(labels["backbone"])[0]}

        def swap(path, leaf):
            sp = jax.tree_util.keystr(path)
            if lab_flat.get(sp) == "frozen" and sp in canon_by_path \
                    and canon_by_path[sp].shape == leaf.shape:
                return canon_by_path[sp]
            return leaf

        new_tree = dict(tree)
        new_tree["backbone"] = jax.tree_util.tree_map_with_path(
            swap, tree["backbone"])
        out[name] = new_tree
    return out


class MultiTaskServer:
    """Dispatches batched inference across AVE / AVQA / AVS heads."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self._fns: Dict[str, Callable] = {}
        self._params: Dict[str, Any] = {}

    def add_ave(self, name: str, cfg: SwinConfig, params):
        p = cast_tree(params, self.dtype)
        fn = jax.jit(lambda p, a, v: ave.apply_swin_ave(p, cfg, a, v))
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"])
        self._params[name] = p

    def add_clip_ave(self, name: str, cfg: ClipConfig, params):
        p = cast_tree(params, self.dtype)
        fn = jax.jit(lambda p, a, v: ave.apply_clip_ave(p, cfg, a, v))
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"])
        self._params[name] = p

    def add_avs(self, name: str, cfg: SwinConfig, hcfg: AVSHeadConfig, params):
        p = cast_tree(params, self.dtype)
        fn = jax.jit(lambda p, a, v: avs.apply_avs(p, cfg, hcfg, a, v)[0])
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"])
        self._params[name] = p

    def add_avqa(self, name: str, cfg: SwinConfig, hcfg: AVQAHeadConfig, params):
        p = cast_tree(params, self.dtype)
        fn = jax.jit(lambda p, a, v, vn, q:
                     avqa.apply_avqa(p, cfg, hcfg, a, v, vn, q)[0])
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"],
                                              batch["v_nega"], batch["question"])
        self._params[name] = p

    def tasks(self):
        return sorted(self._fns)

    def predict(self, task: str, batch: Dict[str, np.ndarray]):
        batch = {k: jnp.asarray(v).astype(self.dtype)
                 if np.issubdtype(np.asarray(v).dtype, np.floating)
                 else jnp.asarray(v) for k, v in batch.items()}
        return np.asarray(self._fns[task](self._params[task], batch),
                          dtype=np.float32)
