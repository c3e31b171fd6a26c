"""AVS segmentation decoder pieces: ASPP classifier, residual conv units,
FPN-style feature fusion with align_corners=True upsampling, output head.

Reference: AVS/model/Swin_AVSModel.py:14-143 and :1500-1507 (output_conv).
All convs are channel-last (NHWC).
"""
from __future__ import annotations


import jax

from ..ops.conv import conv2d, conv2d_init
from ..ops.resize import resize_bilinear


def aspp_init(key, in_ch: int, out_ch: int, dilations=(3, 6, 12, 18)):
    """Classifier_Module: sum of dilated 3x3 convs, weights N(0, 0.01)
    (Swin_AVSModel.py:14-29)."""
    ks = jax.random.split(key, len(dilations))
    return {"convs": [conv2d_init(k, in_ch, out_ch, 3, bias=True, std=0.01)
                      for k in ks]}


def aspp_apply(p, x, dilations=(3, 6, 12, 18)):
    out = None
    for cp, d in zip(p["convs"], dilations):
        y = conv2d(cp, x, stride=1, padding=d, dilation=d)
        out = y if out is None else out + y
    return out


def rcu_init(key, features: int):
    k1, k2 = jax.random.split(key)
    return {"conv1": conv2d_init(k1, features, features, 3),
            "conv2": conv2d_init(k2, features, features, 3)}


def rcu_apply(p, x):
    """ResidualConvUnit (Swin_AVSModel.py:47-78).

    The reference's nn.ReLU(inplace=True) mutates its input, so `out + x` at
    Swin_AVSModel.py:78 actually adds relu(x), NOT x — the true semantics are
    conv2(relu(conv1(relu(x)))) + relu(x). Verified against the torch model in
    tests/test_ref_model_parity.py::test_avs_fusion_parity."""
    xr = jax.nn.relu(x)
    out = conv2d(p["conv1"], xr, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=1)
    return out + xr


def ffb_init(key, features: int):
    k1, k2 = jax.random.split(key)
    return {"resConfUnit1": rcu_init(k1, features),
            "resConfUnit2": rcu_init(k2, features)}


def ffb_apply(p, x, skip=None):
    """FeatureFusionBlock: (optional skip through RCU1) + RCU2 + 2x bilinear
    upsample with align_corners=True (Swin_AVSModel.py:81-111)."""
    out = x
    if skip is not None:
        out = out + rcu_apply(p["resConfUnit1"], skip)
    out = rcu_apply(p["resConfUnit2"], out)
    return resize_bilinear(out, out.shape[-3] * 2, out.shape[-2] * 2,
                           align_corners=True)


def output_conv_init(key, channel: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"conv0": conv2d_init(k1, channel, 128, 3),
            "conv2": conv2d_init(k2, 128, 32, 3),
            "conv4": conv2d_init(k3, 32, 1, 1)}


def output_conv_apply(p, x):
    """output_conv: conv3 -> 2x bilinear (align_corners=False) -> conv3 -> relu ->
    conv1 (Swin_AVSModel.py:1500-1507)."""
    x = conv2d(p["conv0"], x, padding=1)
    x = resize_bilinear(x, x.shape[-3] * 2, x.shape[-2] * 2, align_corners=False)
    x = conv2d(p["conv2"], x, padding=1)
    x = jax.nn.relu(x)
    return conv2d(p["conv4"], x)
