"""jit-compiled train/eval step builders.

TPU policy: grads flow only through the trainable sub-pytree (adapters + heads;
frozen backbone leaves are closed-over constants, so XLA never materializes
their gradients), bf16 compute with fp32 master params and fp32 optimizer state.
No loss scaling is needed on TPU (bf16 has fp32's exponent range) — replaces
the reference's AMP GradScaler (AVE/traintest_adapt_ave29.py:119,165-168).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .optim import merge_params, split_params, trainable_mask


def make_train_step(loss_fn: Callable, tx, *, donate: bool = True,
                    compute_dtype=jnp.bfloat16, compiler_options=None):
    """loss_fn(params, batch, rng) -> (loss, aux). Returns
    train_step(train_params, frozen_params, opt_state, batch, rng, step).

    Gradients are taken only w.r.t. the trainable sub-pytree.
    """

    def cast(tree):
        def leaf(path, a):
            if a is None or not jnp.issubdtype(a.dtype, jnp.floating):
                return a
            # BN running stats (buffers) stay fp32 so the momentum updates
            # they seed are not quantized through bf16 (AVS trains fp32 in
            # the reference — autocast is off for AVS)
            s = jax.tree_util.keystr(path)
            if "'bn'" in s and ("'mean'" in s or "'var'" in s):
                return a
            return a.astype(compute_dtype)
        return jax.tree_util.tree_map_with_path(
            leaf, tree, is_leaf=lambda x: x is None)

    def step_fn(train_params, frozen_params, opt_state, batch, rng):
        def inner(tp):
            params = merge_params(cast(tp), cast(frozen_params))
            return loss_fn(params, batch, rng)

        (loss, aux), grads = jax.value_and_grad(inner, has_aux=True)(train_params)
        grads = jax.tree_util.tree_map(
            lambda g: None if g is None else g.astype(jnp.float32), grads,
            is_leaf=lambda x: x is None)
        updates, opt_state = tx.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss, aux

    donate_argnums = (0, 2) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums,
                   compiler_options=compiler_options)


def make_eval_step(apply_fn: Callable, compute_dtype=jnp.bfloat16):
    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    @jax.jit
    def eval_step(params, batch):
        return apply_fn(cast(params), batch)

    return eval_step


def init_train_state(params, tx, freeze_base: bool = True):
    """Split params and build optimizer state over the trainable subtree only."""
    mask = trainable_mask(params, freeze_base)
    train_params, frozen_params = split_params(params, mask)
    opt_state = tx.init(train_params)
    return train_params, frozen_params, opt_state, mask
