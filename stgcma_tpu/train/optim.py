"""Optimizer construction: name-based trainable partition, torch-Adam-equivalent
optax chain, cosine warmup schedule.

Reference semantics:
- trainable selection (AVE/traintest_adapt_ave29.py:51-61): parameter names
  matching adapter|Adapter|temporal_embedding|ln_post|my_tokens|gate_|ln_before|
  temporal_position_bias_table (+ task-head prefixes) form the "adapt" group;
  the rest of the backbone is frozen when freeze_base.
- Adam(weight_decay=5e-7, betas=(0.95, 0.999)); AVE adds a second group for
  mlp_head at lr * head_lr (:68).
- cosine_scheduler: linear warmup -> cosine to min_lr (utilities/scheduler.py:5-30).
"""
from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

# reference trainable-name patterns + our task-head roots
ADAPT_PATTERNS = ("adapter", "Adapter", "temporal_embedding", "ln_post",
                  "my_tokens", "gate_", "ln_before", "temporal_position_bias_table")
HEAD_ROOTS = ("mlp_head", "avstask", "avqatask")


def label_params(params) -> Any:
    """Label every leaf 'head' / 'adapt' / 'frozen' / 'buffer' by its tree
    path. BatchNorm running stats (TPAVI W_z — AVS/model/TPAVI.py:57-63) are
    'buffer': torch buffers receive momentum updates during forward, never
    gradients, so they must not land in the Adam group."""
    def label(path, _):
        s = jax.tree_util.keystr(path)
        if "'bn'" in s and ("'mean'" in s or "'var'" in s):
            return "buffer"
        if any(f"'{h}'" in s for h in HEAD_ROOTS):
            return "head"
        if any(p in s for p in ADAPT_PATTERNS):
            return "adapt"
        return "frozen"
    return jax.tree_util.tree_map_with_path(label, params)


def trainable_mask(params, freeze_base: bool = True):
    labels = label_params(params)
    return jax.tree_util.tree_map(
        lambda l: (l not in ("frozen", "buffer")) if freeze_base
        else l != "buffer", labels)


def split_params(params, mask):
    """Split into (trainable, frozen) trees with None placeholders, so grads are
    only computed for trainable leaves."""
    train = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def merge_params(train, frozen):
    return jax.tree_util.tree_map(
        lambda t, f: t if t is not None else f, train, frozen,
        is_leaf=lambda x: x is None)


def cosine_schedule(base_lr: float, min_lr: float, epochs: int, steps_per_epoch: int,
                    warmup_epochs: int = 0, warmup_steps: int = -1,
                    start_warmup_value: float = 0.0) -> np.ndarray:
    """Per-step LR table identical to utilities/scheduler.py:5-30."""
    total = epochs * steps_per_epoch
    warmup_iters = warmup_epochs * steps_per_epoch
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    warmup_iters = min(warmup_iters, total)
    warmup = np.linspace(start_warmup_value, base_lr, warmup_iters) \
        if warmup_iters > 0 else np.array([])
    n = epochs * steps_per_epoch - warmup_iters
    i = np.arange(n)
    main = min_lr + 0.5 * (base_lr - min_lr) * (1 + np.cos(np.pi * i / n))
    table = np.concatenate([warmup, main])
    assert len(table) == epochs * steps_per_epoch
    return table.astype(np.float32)


def multistep_schedule(base_lr: float, start: int, step: int, decay: float,
                       epochs: int, steps_per_epoch: int) -> np.ndarray:
    """torch MultiStepLR(milestones=range(start, 1000, step), gamma=decay) as
    a per-step table (AVE/traintest_adapt_ave29.py:105-107 fallback)."""
    table = np.empty(epochs * steps_per_epoch, np.float32)
    for e in range(epochs):
        n_hit = len([m for m in range(start, e + 1, step)]) if e + 1 >= start \
            else 0
        table[e * steps_per_epoch:(e + 1) * steps_per_epoch] = \
            base_lr * decay ** n_hit
    return table


def torch_adam(lr_fn, weight_decay: float = 5e-7, b1: float = 0.95, b2: float = 0.999,
               eps: float = 1e-8):
    """torch.optim.Adam equivalence: L2 folded into the gradient before moments,
    bias-corrected Adam, lr from a schedule callable."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(lr_fn),
    )


def build_optimizer(params, base_lr: float, head_lr_mult: float = 1.0,
                    weight_decay: float = 5e-7,
                    lr_table: np.ndarray = None,
                    head_lr_table: np.ndarray = None):
    """Two-group Adam: 'adapt' @ lr, 'head' @ lr*head_lr, frozen untouched
    (AVE/traintest_adapt_ave29.py:68).

    The reference builds a SEPARATE cosine table for the head group from
    base_value=lr*head_lr down to the same min_lr
    (AVE/traintest_adapt_ave29.py:84-101) — pass it as head_lr_table for
    exact parity; without one the head group falls back to the multiplier
    form (identical except near the min_lr floor).

    Labels are computed by a callable so the transform works both on the full
    tree and on the pruned trainable subtree (None leaves are empty subtrees)."""
    del params  # structure-independent; labels computed lazily

    def table_fn(tab):
        t = jnp.asarray(tab)
        return lambda step: t[jnp.minimum(step, t.shape[0] - 1)]

    lr_fn = table_fn(lr_table) if lr_table is not None else (lambda s: base_lr)
    if head_lr_table is not None:
        head_fn = table_fn(head_lr_table)
    else:
        head_fn = lambda s: lr_fn(s) * head_lr_mult

    tx = optax.multi_transform(
        {"adapt": torch_adam(lr_fn, weight_decay=weight_decay),
         "head": torch_adam(head_fn, weight_decay=weight_decay),
         "frozen": optax.set_to_zero(),
         "buffer": optax.set_to_zero()},
        label_params)
    return tx
