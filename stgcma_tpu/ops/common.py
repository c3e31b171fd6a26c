"""Elementary functional NN ops and initializers.

Parameter convention: every "module" is a plain nested dict of jnp arrays.
Linear kernels are stored (in_features, out_features) — i.e. already transposed
relative to torch's (out, in) — so application is a plain `x @ kernel`.
LayerNorm/softmax always compute in float32 and cast back (TPU bf16 policy).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers (match timm trunc_normal_(std=.02) / torch defaults)
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """timm.models.layers.trunc_normal_: N(0, std) truncated to [-2std, 2std]."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def linear_init(key, in_features, out_features, bias=True, std=0.02):
    """Reference _init_weights: trunc_normal(std=.02) weight, zero bias
    (AVE/model/Swin_AVE.py:1354-1358)."""
    kk, _ = jax.random.split(key)
    p = {"kernel": trunc_normal(kk, (in_features, out_features), std=std)}
    if bias:
        p["bias"] = jnp.zeros((out_features,), jnp.float32)
    return p


def linear_torch_default_init(key, in_features, out_features, bias=True):
    """torch nn.Linear default init (kaiming uniform, bound = 1/sqrt(in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {"kernel": jax.random.uniform(k1, (in_features, out_features), jnp.float32,
                                      -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_features,), jnp.float32, -bound, bound)
    return p


def layernorm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def zeros_linear(in_features, out_features, bias=True):
    """Zero-initialized linear — adapter D_fc2 (Swin_AVE.py:1422-1468)."""
    p = {"kernel": jnp.zeros((in_features, out_features), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_features,), jnp.float32)
    return p


# ---------------------------------------------------------------------------
# apply fns
# ---------------------------------------------------------------------------

def linear(p, x):
    if "kernel_q" in p:  # int8 frozen-tower serving mode (ops/quant.py)
        from .quant import linear_q
        return linear_q(p, x)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layernorm(p, x, eps=1e-5):
    """LayerNorm over the last axis; compute in fp32, return in input dtype
    (mirrors CLIP_AVE.py:33-39 fp16-safe LayerNorm)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dt)


def gelu(x):
    """Exact erf GELU (torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    """CLIP QuickGELU: x * sigmoid(1.702 x) (CLIP_AVE.py:41-43)."""
    return x * jax.nn.sigmoid(1.702 * x)


def softmax_f32(x, axis=-1):
    """Softmax computed in float32, cast back to the input dtype."""
    dt = x.dtype
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(dt)


def mlp_init(key, dim, hidden, std=0.02):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, dim, hidden, std=std),
            "fc2": linear_init(k2, hidden, dim, std=std)}


def mlp_apply(p, x, act=gelu):
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def cast_tree(tree, dtype):
    """Cast all floating leaves of a pytree to `dtype` (bf16 compute policy)."""
    def _cast(a):
        if isinstance(a, jnp.ndarray) and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a
    return jax.tree_util.tree_map(_cast, tree)
