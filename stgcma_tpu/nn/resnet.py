"""ResNet-18 feature extractor (JAX, NHWC) — used by the AVQA grounding-gen
offline pretraining stage (reference: AVQA/grounding_gen/visual_net.py, a
torchvision resnet copy; consumed at nets_grd_gen.py:20 with the fc removed,
returning layer4 conv features [B, 512, 14, 14] for 224x224 input).

Inference-mode BatchNorm (frozen backbone use-case). A torchvision resnet18
state_dict loads via checkpoint.torch_convert.load_resnet18.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.conv import batchnorm, batchnorm_init, conv2d, conv2d_init

_STAGES = ((64, 2), (128, 2), (256, 2), (512, 2))  # (width, blocks) per layer


def _bn_init(ch):
    return batchnorm_init(ch)


def _block_init(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": conv2d_init(ks[0], cin, cout, 3, bias=False),
        "bn1": _bn_init(cout),
        "conv2": conv2d_init(ks[1], cout, cout, 3, bias=False),
        "bn2": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {"conv": conv2d_init(ks[2], cin, cout, 1, bias=False),
                           "bn": _bn_init(cout)}
    return p


def resnet18_init(key) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)
    p: Dict[str, Any] = {
        "conv1": conv2d_init(ks[0], 3, 64, 7, bias=False),
        "bn1": _bn_init(64),
    }
    cin = 64
    ki = 1
    for li, (width, blocks) in enumerate(_STAGES):
        layer = []
        for b in range(blocks):
            stride = 2 if (b == 0 and li > 0) else 1
            layer.append(_block_init(ks[ki], cin, width, stride))
            ki += 1
            cin = width
        p[f"layer{li+1}"] = layer
    return p


def _basic_block(p, x, stride):
    identity = x
    y = conv2d(p["conv1"], x, stride=stride, padding=1)
    y = jax.nn.relu(batchnorm(p["bn1"], y))
    y = conv2d(p["conv2"], y, padding=1)
    y = batchnorm(p["bn2"], y)
    if "downsample" in p:
        identity = batchnorm(p["downsample"]["bn"],
                             conv2d(p["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(y + identity)


def resnet18_features(p, x):
    """x: (B, H, W, 3) normalized -> layer4 features (B, H/16, W/16, 512).

    NOTE: grounding-gen uses a stride-modified resnet (14x14 output at 224
    input => overall stride 16: layer4 keeps stride 1 in the reference copy)."""
    y = conv2d(p["conv1"], x, stride=2, padding=3)
    y = jax.nn.relu(batchnorm(p["bn1"], y))
    # maxpool 3x3 s2 p1
    y = -jax.lax.reduce_window(-y, jnp.inf, jax.lax.min, (1, 3, 3, 1),
                               (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li, (width, blocks) in enumerate(_STAGES):
        for b, bp in enumerate(p[f"layer{li+1}"]):
            # layer4 runs at stride 1 so 224 -> 14x14 (grounding-gen variant)
            stride = 2 if (b == 0 and li in (1, 2)) else 1
            if li == 3 and b == 0:
                stride = 1
            y = _basic_block(bp, y, stride)
    return y
