"""torch-compatible LSTM via lax.scan (replaces cuDNN nn.LSTM, SURVEY.md §2.13).

Gate order matches PyTorch packed weights: [input, forget, cell(g), output].
Reference call site: AVQA QstEncoder (AVQA/model/Swin_AVQAModel_V1.py:37-59).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def lstm_init(key, input_size: int, hidden_size: int, num_layers: int = 1):
    """Weights stored transposed relative to torch: w_ih (in, 4H), w_hh (H, 4H)."""
    layers = []
    keys = jax.random.split(key, num_layers * 4)
    bound = 1.0 / math.sqrt(hidden_size)
    for l in range(num_layers):
        in_sz = input_size if l == 0 else hidden_size
        k0, k1, k2, k3 = keys[4 * l: 4 * l + 4]
        layers.append({
            "w_ih": jax.random.uniform(k0, (in_sz, 4 * hidden_size), jnp.float32,
                                       -bound, bound),
            "w_hh": jax.random.uniform(k1, (hidden_size, 4 * hidden_size), jnp.float32,
                                       -bound, bound),
            "b_ih": jax.random.uniform(k2, (4 * hidden_size,), jnp.float32, -bound, bound),
            "b_hh": jax.random.uniform(k3, (4 * hidden_size,), jnp.float32, -bound, bound),
        })
    return {"layers": layers}


def _cell_scan(p, x, h0, c0):
    """x: (T, B, in) -> outputs (T, B, H), (hT, cT)."""
    H = h0.shape[-1]
    w_ih = p["w_ih"].astype(x.dtype)
    w_hh = p["w_hh"].astype(x.dtype)
    b = (p["b_ih"] + p["b_hh"]).astype(x.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih + h @ w_hh + b
        i = jax.nn.sigmoid(gates[..., 0:H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), x)
    return ys, (hT, cT)


def lstm_apply(params, x, hidden_size: int):
    """x: (T, B, input_size) (torch seq-first). Returns (outputs, (h_n, c_n)) with
    h_n/c_n shaped (num_layers, B, H) like torch."""
    B = x.shape[1]
    hs, cs = [], []
    y = x
    for p in params["layers"]:
        h0 = jnp.zeros((B, hidden_size), y.dtype)
        c0 = jnp.zeros((B, hidden_size), y.dtype)
        y, (hT, cT) = _cell_scan(p, y, h0, c0)
        hs.append(hT)
        cs.append(cT)
    return y, (jnp.stack(hs), jnp.stack(cs))
