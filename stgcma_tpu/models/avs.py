"""AVSBench S4/MS3 segmentation model: Swin fusion backbone + multi-scale
ASPP / TPAVI / FPN decoder.

Reference: SwinTransformer2D_Adapter_AVS (AVS/model/Swin_AVSModel.py:1266-1894).
I/O (§2.6): a [B,5,224,224], v [B,5,224,224,3] (native) ->
  (pred [B*5,224,224,1], feature_map_list 4x[B*5,h,w,256], a_fea_list 4x[B,5,256]).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import AVSHeadConfig, SwinConfig
from ..nn import swin, tpavi
from ..nn.decoder import (aspp_apply, aspp_init, ffb_apply, ffb_init,
                          output_conv_apply, output_conv_init)
from ..ops.common import linear, linear_init


def init_avs_head(key, hcfg: AVSHeadConfig) -> Dict[str, Any]:
    n = len(hcfg.stage_dims)
    ks = jax.random.split(key, 3 * n + len(hcfg.tpavi_stages) + 2)
    p: Dict[str, Any] = {}
    for i in range(n):
        p[f"x{i+1}_linear"] = linear_init(ks[i], hcfg.stage_dims[i], hcfg.vis_dim[i])
        p[f"conv{i+1}"] = aspp_init(ks[n + i], hcfg.vis_dim[i], hcfg.channel)
        p[f"path{i+1}"] = ffb_init(ks[2 * n + i], hcfg.channel)
    p["audio_linear"] = linear_init(ks[3 * n], hcfg.audio_dim, hcfg.tpavi_audio_dim)
    for j, i in enumerate(hcfg.tpavi_stages):
        p[f"tpavi_b{i+1}"] = tpavi.tpavi_init(ks[3 * n + 1 + j], hcfg.channel,
                                              hcfg.tpavi_audio_dim)
    p["output_conv"] = output_conv_init(ks[-1], hcfg.channel)
    return p


def init_avs(key, cfg: SwinConfig, hcfg: AVSHeadConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"backbone": swin.backbone_init(k1, cfg),
            "avstask": init_avs_head(k2, hcfg)}


def init_avs_pvt(key, hcfg: AVSHeadConfig):
    """PVT-v2-b5 AVS baseline (reference: AVS/model/PVT_AVSModel.py:323 wiring
    pvt_v2_b5 into the TPAVI decoder — kept unwired in the reference repo).
    PVT stage dims equal vis_dim, so no x_linear projections are needed."""
    from ..nn import pvt
    from ..nn.decoder import aspp_init, ffb_init, output_conv_init
    from ..nn import tpavi as _tpavi
    k1, k2 = jax.random.split(key)
    ks = jax.random.split(k2, 9 + len(hcfg.tpavi_stages))
    head: Dict[str, Any] = {}
    for i in range(4):
        head[f"conv{i+1}"] = aspp_init(ks[i], hcfg.vis_dim[i], hcfg.channel)
        head[f"path{i+1}"] = ffb_init(ks[4 + i], hcfg.channel)
    for j, i in enumerate(hcfg.tpavi_stages):
        head[f"tpavi_b{i+1}"] = _tpavi.tpavi_init(ks[8 + j], hcfg.channel,
                                                  hcfg.tpavi_audio_dim)
    head["output_conv"] = output_conv_init(ks[-1], hcfg.channel)
    return {"encoder": pvt.pvt_init(k1, pvt.B5), "avstask": head}


def apply_avs_pvt(params, hcfg: AVSHeadConfig, audio_feat, frames, train=False,
                  return_state=False):
    """audio_feat: (B, T, 128) VGGish features; frames: (B*T, H, W, 3).
    Returns (pred, feature_map_list, a_fea_list) like apply_avs
    (+ bn_state dict when return_state)."""
    from ..nn import pvt, tpavi as _tpavi
    from ..nn.decoder import aspp_apply, ffb_apply, output_conv_apply
    hp = params["avstask"]
    maps = pvt.pvt_apply(params["encoder"], frames)
    feature_map_list = [aspp_apply(hp[f"conv{i+1}"], m)
                        for i, m in enumerate(maps)]
    B, T = audio_feat.shape[0], audio_feat.shape[1]
    a_fea_list: List[Optional[jnp.ndarray]] = [None] * 4
    bn_state = {}
    for i in hcfg.tpavi_stages:
        fm = feature_map_list[i]
        BT, H, W, C = fm.shape
        z, a_fea, bn_new = _tpavi.tpavi_apply(hp[f"tpavi_b{i+1}"],
                                              fm.reshape(B, T, H, W, C),
                                              audio_feat, train=train)
        if bn_new is not None:
            bn_state[f"tpavi_b{i+1}"] = {"mean": bn_new["mean"],
                                         "var": bn_new["var"]}
        a_fea_list[i] = a_fea
        feature_map_list[i] = z.reshape(BT, H, W, C)
    x = ffb_apply(hp["path4"], feature_map_list[3])
    for i in (2, 1, 0):
        x = ffb_apply(hp[f"path{i+1}"], x, feature_map_list[i])
    pred = output_conv_apply(hp["output_conv"], x)
    # mirror the reference's in-place-ReLU mutation of the returned maps
    # (see apply_avs)
    feature_map_list = [jax.nn.relu(fm) for fm in feature_map_list]
    if return_state:
        return pred, feature_map_list, a_fea_list, bn_state
    return pred, feature_map_list, a_fea_list


def apply_avs(params, cfg: SwinConfig, hcfg: AVSHeadConfig, a, v, train=False,
              return_state=False):
    """Fusion forward (Swin_AVSModel.py:1790-1894). Returns
    (pred, feature_map_list, a_fea_list)."""
    feats = swin.backbone_apply(params["backbone"], cfg, a=a, v=v,
                                collect_multiscale=True)
    hp = params["avstask"]
    B, T = feats["B"], feats["T"]

    # pooled audio per frame -> 128-d TPAVI conditioning
    a_pool = feats["a"].mean(axis=1)                    # (B*T, C)
    audio_feature = a_pool.reshape(B, T, -1)
    audio_feature = linear(hp["audio_linear"], audio_feature)   # (B, T, 128)

    # stage taps -> spatial maps -> channel align -> ASPP
    res = hcfg.stage_resolutions
    feature_map_list = []
    for i, tap in enumerate(feats["multi_scale"]):
        r = res[i]
        x = tap.reshape(tap.shape[0], r, r, -1)         # (B*T, r, r, C_i)
        x = linear(hp[f"x{i+1}_linear"], x)             # (B*T, r, r, vis_dim)
        x = aspp_apply(hp[f"conv{i+1}"], x)             # (B*T, r, r, 256)
        feature_map_list.append(x)

    n = len(hcfg.stage_dims)
    a_fea_list: List[Optional[jnp.ndarray]] = [None] * n
    bn_state = {}
    for i in hcfg.tpavi_stages:
        fm = feature_map_list[i]
        BT, H, W, C = fm.shape
        x5 = fm.reshape(B, T, H, W, C)
        if hcfg.tpavi_va_flag:
            z, a_fea, bn_new = tpavi.tpavi_apply(hp[f"tpavi_b{i+1}"], x5,
                                                 audio_feature, train=train)
            if bn_new is not None:
                # running-stat momentum updates (torch buffer semantics,
                # TPAVI.py:57-63); routed out through the train step's aux
                bn_state[f"tpavi_b{i+1}"] = {"mean": bn_new["mean"],
                                             "var": bn_new["var"]}
            a_fea_list[i] = a_fea
            feature_map_list[i] = z.reshape(BT, H, W, C)

    # FPN top-down decode (each path 2x-upsamples, align_corners=True;
    # reference: path4 -> path1, Swin_AVSModel.py:1887-1890)
    x = ffb_apply(hp[f"path{n}"], feature_map_list[-1])
    for i in range(n - 2, -1, -1):
        x = ffb_apply(hp[f"path{i+1}"], x, feature_map_list[i])

    pred = output_conv_apply(hp["output_conv"], x)  # (B*T, 224, 224, 1) at full cfg
    # The reference's in-place ReLU inside ResidualConvUnit mutates every map
    # it receives, so the feature_map_list the caller (and the A-MaskedV simm
    # loss, AVS/loss.py:46) sees is relu(fm) — mirror that exactly.
    feature_map_list = [jax.nn.relu(fm) for fm in feature_map_list]
    if return_state:
        return pred, feature_map_list, a_fea_list, bn_state
    return pred, feature_map_list, a_fea_list
