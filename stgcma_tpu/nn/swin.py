"""Swin-2D adapter backbone with STG-CMA cross-modal fusion — TPU-native.

One parameterized implementation replaces the reference's three near-identical
~1.9k-line task copies (AVE/model/Swin_AVE.py, AVQA/model/Swin_AVQAModel_V1.py,
AVS/model/Swin_AVSModel.py). Only the reference's *active* code paths are
implemented (SURVEY.md §2.1 note).

Design notes (TPU-first):
- everything is static-shape; window partition/shift are reshapes + jnp.roll
  (XLA lowers the roll to concat/slice)
- tokens are channel-last (.., N, C) with C a multiple of 128 at every stage
  for all reference presets — MXU/VPU lane-aligned
- softmax/LayerNorm in fp32; matmuls honored via preferred_element_type
- parameters are plain nested dicts so torch checkpoints map 1:1
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import SwinConfig
from ..ops import window as W
from ..ops.attention import cross_modal_fuse, temporal_attention, window_attention
from ..ops.pallas_attn import (cross_modal_fuse_flash, fused_attention_enabled,
                               layernorm_fused)
from ..ops.common import (layernorm, layernorm_init, linear, linear_init,
                          mlp_apply, mlp_init, trunc_normal)
from ..ops.conv import conv3d, conv3d_init
from .adapters import adapter_apply, adapter_hidden, adapter_init, adapter_out

MODES = ("video_adapt", "audio_adapt", "multimodal_adapt_no_fusion", "fusion_adapt")


# ---------------------------------------------------------------------------
# static (non-parameter) geometry per block
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlockStatic:
    dim: int
    H: int
    W: int
    num_heads: int
    window_size: int
    shift_size: int
    t_attn: bool
    num_frames: int
    adapter_ratio: float
    mode: str
    # ablation switches (Swin_AVSModel_without_adapt.py variants)
    use_t_adapter: bool = True
    use_s_adapter: bool = True
    use_g_adapter: bool = True

    @property
    def tokens_per_window(self) -> int:
        return self.window_size * self.window_size


def make_block_static(cfg: SwinConfig, stage: int, block_idx: int, mode: str) -> BlockStatic:
    H, Wd = cfg.stage_resolution(stage)
    ws = cfg.window_size
    shift = 0 if block_idx % 2 == 0 else ws // 2
    # Swin_AVE.py:330-334 — window larger than the feature map: shrink, no shift
    if min(H, Wd) <= ws:
        ws = min(H, Wd)
        shift = 0
    return BlockStatic(
        dim=cfg.stage_dim(stage), H=H, W=Wd, num_heads=cfg.num_heads[stage],
        window_size=ws, shift_size=shift,
        t_attn=(block_idx % 2 == 0) and cfg.use_temporal_attn,
        num_frames=cfg.num_ttokens, adapter_ratio=cfg.adapter_ratios[stage],
        mode=mode, use_t_adapter=cfg.use_t_adapter,
        use_s_adapter=cfg.use_s_adapter, use_g_adapter=cfg.use_g_adapter)


def _mode_for_ftmode(ftmode: str) -> str:
    return {"videoonly": "video_adapt", "audioonly": "audio_adapt",
            "multimodal": "multimodal_adapt_no_fusion", "fusion": "fusion_adapt"}[ftmode]


class _StaticCache:
    """Per-process cache of numpy index/mask constants (keyed by geometry)."""
    _rel: Dict[int, np.ndarray] = {}
    _tid: Dict[int, np.ndarray] = {}
    _mask: Dict[Tuple[int, int, int, int], np.ndarray] = {}

    @classmethod
    def rel_index(cls, ws: int) -> np.ndarray:
        if ws not in cls._rel:
            cls._rel[ws] = W.relative_position_index(ws)
        return cls._rel[ws]

    @classmethod
    def t_index(cls, t: int) -> np.ndarray:
        if t not in cls._tid:
            cls._tid[t] = W.temporal_relative_index(t)
        return cls._tid[t]

    @classmethod
    def mask(cls, H: int, Wd: int, ws: int, ss: int) -> Optional[np.ndarray]:
        if ss == 0:
            return None
        key = (H, Wd, ws, ss)
        if key not in cls._mask:
            cls._mask[key] = W.shift_attn_mask(H, Wd, ws, ss)
        return cls._mask[key]


# ---------------------------------------------------------------------------
# block init
# ---------------------------------------------------------------------------

def block_init(key, st: BlockStatic, qkv_bias: bool = True) -> Dict[str, Any]:
    ks = jax.random.split(key, 16)
    dim, nh = st.dim, st.num_heads
    p: Dict[str, Any] = {
        "norm1": layernorm_init(dim),
        "norm2": layernorm_init(dim),
        "attn": {
            "qkv": linear_init(ks[0], dim, dim * 3, bias=qkv_bias),
            "proj": linear_init(ks[1], dim, dim),
            "relative_position_bias_table": trunc_normal(
                ks[2], ((2 * st.window_size - 1) ** 2, nh)),
        },
        "mlp": mlp_init(ks[3], dim, int(dim * 4.0)),
        "gate_v": jnp.zeros((1,), jnp.float32),
        "gate_a": jnp.zeros((1,), jnp.float32),
    }
    if st.t_attn:
        p["attn"]["temporal_position_bias_table"] = trunc_normal(
            ks[4], (2 * st.num_frames - 1, nh))
        p["attn"]["temporal_position_bias_table_audio"] = trunc_normal(
            ks[5], (2 * st.num_frames - 1, nh))
    video = st.mode in ("video_adapt", "multimodal_adapt_no_fusion", "fusion_adapt")
    audio = st.mode in ("audio_adapt", "multimodal_adapt_no_fusion", "fusion_adapt")
    r = st.adapter_ratio
    if video:
        if st.t_attn and st.use_t_adapter:
            p["T_Adapter"] = adapter_init(ks[6], dim, r)
        if st.use_g_adapter:
            p["S_Adapter"] = adapter_init(ks[7], dim, r)
        if st.use_s_adapter:
            p["S_Adapter2"] = adapter_init(ks[8], dim, r)
    if audio:
        if st.t_attn and st.use_t_adapter:
            p["T_Adapter_Audio"] = adapter_init(ks[9], dim, r)
        if st.use_g_adapter:
            p["S_Adapter_Audio"] = adapter_init(ks[10], dim, r)
        if st.use_s_adapter:
            p["S_Adapter2_Audio"] = adapter_init(ks[11], dim, r)
    return p


# ---------------------------------------------------------------------------
# block forward pieces
# ---------------------------------------------------------------------------

def _temporal_branch(p, x, st: BlockStatic, signal: str, adapter_key: str):
    """Temporal attention over T frame tokens + no-skip T_Adapter + residual
    (Swin_AVE.py:705-716). x: (B*T, N, C)."""
    BT, N, C = x.shape
    T = st.num_frames
    B = BT // T
    t_index = jnp.asarray(_StaticCache.t_index(T))
    xt = x.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    if fused_attention_enabled() and st.num_heads <= 16:
        # float AND int8 towers: the megakernel routes on 'kernel_q'
        from ..ops.pallas_attn import temporal_block_megakernel
        res = temporal_block_megakernel(p["attn"], p["norm1"], xt,
                                        st.num_heads, t_index, signal=signal)
    elif fused_attention_enabled():
        from ..ops.pallas_attn import temporal_attention_fused
        res = temporal_attention_fused(p["attn"], layernorm_fused(p["norm1"], xt),
                                       st.num_heads, t_index, signal=signal)
    else:
        res = temporal_attention(p["attn"], layernorm(p["norm1"], xt), st.num_heads,
                                 t_index, signal=signal)
    if st.use_t_adapter:
        res = adapter_apply(p[adapter_key], res, skip=False)
    xt = xt + res
    return xt.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(BT, N, C)



def _ffn(p, x):
    """FFN (LN+fc1+gelu+fc2). Shape-aware kernel policy: XLA materializes the
    (tokens, 4C) GELU hidden in HBM, which dominates at the wide early stages
    (stage 0: 824 MB of hidden round-trip per FFN — TPU profile, BENCH_NOTES);
    the Pallas megakernel keeps the hidden in VMEM. For small token counts
    (CLIP 197-token maps, late Swin stages) XLA's fusion measured ~3% faster,
    so the kernel only engages above a hidden-size threshold (or via
    STGCMA_FUSED_FFN=1/0 override)."""
    import os
    if fused_attention_enabled() and "kernel_q" in p["mlp"]["fc1"]:
        # int8 tower: always the fused W8A8 FFN kernel (in-kernel activation
        # quant is what makes int8 pay — ops/pallas_attn.py)
        from ..ops.pallas_attn import ffn_q_megakernel
        return ffn_q_megakernel(p["mlp"], p["norm2"], x)
    if fused_attention_enabled() and "kernel" in p["mlp"]["fc1"]:
        env = os.environ.get("STGCMA_FUSED_FFN")
        hidden = p["mlp"]["fc1"]["kernel"].shape[1]
        hidden_bytes = (x.size // x.shape[-1]) * hidden * x.dtype.itemsize
        if env == "1" or (env != "0" and hidden_bytes >= (96 << 20)):
            from ..ops.pallas_attn import ffn_megakernel
            return ffn_megakernel(p["mlp"], p["norm2"], x)
    return mlp_apply(p["mlp"], layernorm(p["norm2"], x))


def _spatial_windows(p, x, st: BlockStatic):
    """LN -> shift -> partition -> W-MSA. Returns (attn_windows, shortcut).

    Fused path: LN commutes with the (position-wise) window partition, so the
    megakernel runs LN + qkv + attention + proj in one VMEM pass per tile."""
    BT, L, C = x.shape
    shortcut = x
    mask_np = _StaticCache.mask(st.H, st.W, st.window_size, st.shift_size)
    mask = None if mask_np is None else jnp.asarray(mask_np)
    rel = jnp.asarray(_StaticCache.rel_index(st.window_size))
    if fused_attention_enabled() and st.num_heads <= 16:
        # full megakernel (LN+qkv+attn+proj; int8 routed on 'kernel_q').
        # Mosaic compile time scales with
        # the unrolled head loop, so many-head stages use the v1 kernel below.
        from ..ops.pallas_attn import window_block_megakernel
        xr = x.reshape(BT, st.H, st.W, C)
        if st.shift_size > 0:
            xr = jnp.roll(xr, (-st.shift_size, -st.shift_size), axis=(1, 2))
        xw = W.window_partition(xr, st.window_size)
        attn_w = window_block_megakernel(p["attn"], p["norm1"], xw,
                                         st.num_heads, rel, mask=mask)
        return attn_w, shortcut
    xn = layernorm(p["norm1"], x).reshape(BT, st.H, st.W, C)
    if st.shift_size > 0:
        xn = jnp.roll(xn, (-st.shift_size, -st.shift_size), axis=(1, 2))
    xw = W.window_partition(xn, st.window_size)
    if fused_attention_enabled():
        from ..ops.pallas_attn import window_attention_fused
        attn_w = window_attention_fused(p["attn"], xw, st.num_heads, rel, mask=mask)
    else:
        attn_w = window_attention(p["attn"], xw, st.num_heads, rel, mask=mask)
    return attn_w, shortcut


def _merge_windows(attn_w, st: BlockStatic, BT: int):
    x = W.window_reverse(attn_w, st.window_size, st.H, st.W)
    if st.shift_size > 0:
        x = jnp.roll(x, (st.shift_size, st.shift_size), axis=(1, 2))
    return x.reshape(BT, st.H * st.W, -1)


def _single_stream(p, x, st: BlockStatic, signal: str):
    """video_adapt / audio_adapt paths (Swin_AVE.py:394-488)."""
    sfx = "" if signal == "video" else "_Audio"
    if st.t_attn:
        x = _temporal_branch(p, x, st, signal, "T_Adapter" + sfx)
    attn_w, shortcut = _spatial_windows(p, x, st)
    if st.use_s_adapter:
        attn_w = adapter_apply(p["S_Adapter2" + sfx], attn_w, skip=True)
    x = shortcut + _merge_windows(attn_w, st, x.shape[0])
    xn = layernorm(p["norm2"], x)
    out = x + mlp_apply(p["mlp"], xn)
    if st.use_g_adapter:
        out = out + 0.5 * adapter_apply(p["S_Adapter" + sfx], xn, skip=False)
    return out


def _dual_no_fusion(p, v, a, st: BlockStatic):
    """multimodal_adapt_no_fusion (Swin_AVE.py:490-591). NOTE the FFN adapter here
    operates on the MLP *output* without the 0.5 factor, unlike video_adapt."""
    out = []
    for x, sfx, signal in ((v, "", "video"), (a, "_Audio", "audio")):
        if st.t_attn:
            x = _temporal_branch(p, x, st, signal, "T_Adapter" + sfx)
        attn_w, shortcut = _spatial_windows(p, x, st)
        if st.use_s_adapter:
            attn_w = adapter_apply(p["S_Adapter2" + sfx], attn_w, skip=True)
        x = shortcut + _merge_windows(attn_w, st, x.shape[0])
        xn = _ffn(p, x)
        x = x + xn
        if st.use_g_adapter:
            x = x + adapter_apply(p["S_Adapter" + sfx], xn, skip=False)
        out.append(x)
    return out[0], out[1]


def _dual_fusion(p, v, a, st: BlockStatic, nega=None):
    """fusion_adapt — the STG-CMA core (Swin_AVE.py:693-813):
    temporal attn per modality, W-MSA per modality, bidirectional cross-modal
    attention on spatial-adapter hiddens (gated), window merge, then the same
    exchange on FFN ("joint/global") adapter hiddens. The optional `nega`
    stream passes through the frozen tower with no adapters
    (Swin_AVQAModel_V1.py v_nega path).

    NOTE: a concatenated-modality variant (one tower pass on [v; a]) measured
    ~8% slower on v5e — the concat/split HBM copies outweigh the launch savings
    — so streams stay separate.
    """
    if st.t_attn:
        v = _temporal_branch(p, v, st, "video", "T_Adapter")
        a = _temporal_branch(p, a, st, "audio", "T_Adapter_Audio")

    from ..ops.pallas_swin_block import (swin_fusion_whole_block,
                                         swin_whole_block_enabled)
    if swin_whole_block_enabled(st):
        # whole-block megakernel: shifted W-MSA (mask-encoded windows,
        # no roll/partition/merge HBM copies) + spatial fusion + FFN +
        # joint fusion in ONE VMEM pass (ops/pallas_swin_block.py).
        # The AVQA nega stream (plain tower, no adapters) rides the
        # windowed path below independently.
        v, a = swin_fusion_whole_block(p, v, a, st)
        if nega is None:
            return v, a
        ng_attn, ng_short = _spatial_windows(p, nega, st)
        ng = ng_short + _merge_windows(ng_attn, st, nega.shape[0])
        ng = ng + _ffn(p, ng)
        return v, a, ng

    attn_v, shortcut_v = _spatial_windows(p, v, st)
    attn_a, shortcut_a = _spatial_windows(p, a, st)

    # spatial STG-CMA over window tokens (Nv == Na == ws*ws per window)
    if st.use_s_adapter:
        vs_h = adapter_hidden(p["S_Adapter2"], attn_v)
        as_h = adapter_hidden(p["S_Adapter2_Audio"], attn_a)
        # per-window bidirectional exchange: Pallas kernel on TPU (the XLA
        # naive form materializes (BT*nW, ws^2, ws^2) fp32 logits twice)
        from ..ops.pallas_attn import cross_modal_fuse_windows
        vs_h, as_h = cross_modal_fuse_windows(vs_h, as_h, p["gate_v"], p["gate_a"])
        attn_v = attn_v + adapter_out(p["S_Adapter2"], vs_h)
        attn_a = attn_a + adapter_out(p["S_Adapter2_Audio"], as_h)

    v = shortcut_v + _merge_windows(attn_v, st, v.shape[0])
    a = shortcut_a + _merge_windows(attn_a, st, a.shape[0])

    # joint/global STG-CMA on FFN outputs, token-level over the full stage grid
    vn = _ffn(p, v)
    an = _ffn(p, a)
    if st.use_g_adapter:
        vn_h = adapter_hidden(p["S_Adapter"], vn)
        an_h = adapter_hidden(p["S_Adapter_Audio"], an)
        # full-grid cross attention: Pallas row-block kernel for large N
        vn_h, an_h = cross_modal_fuse_flash(vn_h, an_h, p["gate_v"], p["gate_a"])
        v = v + vn + adapter_out(p["S_Adapter"], vn_h)
        a = a + an + adapter_out(p["S_Adapter_Audio"], an_h)
    else:
        v = v + vn
        a = a + an

    if nega is not None:
        ng_attn, ng_short = _spatial_windows(p, nega, st)
        ng = ng_short + _merge_windows(ng_attn, st, nega.shape[0])
        ng = ng + _ffn(p, ng)
        return v, a, ng
    return v, a


def block_apply(p, x, st: BlockStatic):
    """x is a tensor (single-stream) or a tuple (v, a) / (v, a, v_nega)."""
    if st.mode == "video_adapt":
        return _single_stream(p, x, st, "video")
    if st.mode == "audio_adapt":
        return _single_stream(p, x, st, "audio")
    if st.mode == "multimodal_adapt_no_fusion":
        v, a = x
        return _dual_no_fusion(p, v, a, st)
    if st.mode == "fusion_adapt":
        if len(x) == 3:
            return _dual_fusion(p, x[0], x[1], st, nega=x[2])
        v, a = x
        return _dual_fusion(p, v, a, st)
    raise ValueError(f"unknown mode {st.mode}")


# ---------------------------------------------------------------------------
# patch embed / merging / stage / backbone
# ---------------------------------------------------------------------------

def patch_embed_init(key, cfg: SwinConfig, in_chans: int):
    k1, _ = jax.random.split(key)
    return {"proj": conv3d_init(k1, in_chans, cfg.embed_dim, cfg.patch_size),
            "norm": layernorm_init(cfg.embed_dim)}


def patch_embed_apply(p, x, cfg: SwinConfig):
    """x: (B, T, H, W, C_in) -> tokens (B*T', H'W', C), T' = T // pt
    (reference PatchEmbed3D, Swin_AVE.py:1078-1124)."""
    B = x.shape[0]
    y = conv3d(p["proj"], x, stride=cfg.patch_size)  # (B, T', H', W', C)
    _, Tp, Hp, Wp, C = y.shape
    y = y.reshape(B * Tp, Hp * Wp, C)
    y = layernorm_fused(p["norm"], y)
    return y, B, Tp


def patch_merging_init(key, dim: int):
    return {"norm": layernorm_init(4 * dim),
            "reduction": {"kernel": trunc_normal(key, (4 * dim, 2 * dim))}}


def patch_merging_apply(p, x, H: int, Wd: int):
    x = W.patch_merge(x, H, Wd)
    x = layernorm_fused(p["norm"], x)
    return linear(p["reduction"], x)


def backbone_statics(cfg: SwinConfig) -> List[List[BlockStatic]]:
    mode = _mode_for_ftmode(cfg.ftmode)
    return [[make_block_static(cfg, s, i, mode) for i in range(cfg.depths[s])]
            for s in range(cfg.num_layers)]


def backbone_init(key, cfg: SwinConfig) -> Dict[str, Any]:
    statics = backbone_statics(cfg)
    keys = jax.random.split(key, cfg.num_layers + 3)
    layers = []
    for s in range(cfg.num_layers):
        bkeys = jax.random.split(keys[s], cfg.depths[s] + 1)
        layer = {"blocks": [block_init(bkeys[i], statics[s][i], cfg.qkv_bias)
                            for i in range(cfg.depths[s])]}
        if s < cfg.num_layers - 1:
            layer["downsample"] = patch_merging_init(bkeys[-1], cfg.stage_dim(s))
        layers.append(layer)
    return {
        "patch_embed": patch_embed_init(keys[-3], cfg, cfg.in_chans),
        "patch_embed_audio": patch_embed_init(keys[-2], cfg, 1),
        "layers": layers,
        "norm": layernorm_init(cfg.num_features),
    }


def _run_layers(params, cfg: SwinConfig, statics, x, collect_multiscale=False):
    """Run all stages. x is a tensor or tuple; returns (x, multi_scale list of the
    *visual* stream before each downsample — AVS taps, Swin_AVSModel.py:1811-1821)."""
    import functools as _ft
    multi_scale = []
    for s, layer in enumerate(params["layers"]):
        blocks = layer["blocks"]
        depth = len(blocks)
        if cfg.scan_blocks and depth >= cfg.scan_blocks and depth % 2 == 0:
            # All even blocks in a stage share one BlockStatic (shift=0) and
            # all odd blocks another (shift=ws//2) — make_block_static depends
            # on block_idx only via its parity — so a lax.scan over stacked
            # (regular, shifted) pair params is numerically identical to the
            # unrolled loop with O(1) compile time in depth.
            st_e, st_o = statics[s][0], statics[s][1]
            pairs = [{"e": blocks[2 * k], "o": blocks[2 * k + 1]}
                     for k in range(depth // 2)]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pairs)

            def pair_body(x, bp, _st_e=st_e, _st_o=st_o):
                x = block_apply(bp["e"], x, _st_e)
                x = block_apply(bp["o"], x, _st_o)
                return x, None

            if cfg.use_checkpoint:
                pair_body = jax.checkpoint(pair_body)
            x, _ = jax.lax.scan(pair_body, x, stacked)
        else:
            for i, bp in enumerate(blocks):
                if cfg.use_checkpoint:
                    x = jax.checkpoint(
                        _ft.partial(block_apply, st=statics[s][i]))(bp, x)
                else:
                    x = block_apply(bp, x, statics[s][i])
        if collect_multiscale:
            v_tap = x[0] if isinstance(x, tuple) else x
            if s == cfg.num_layers - 1:
                v_tap = layernorm_fused(params["norm"], v_tap)
            multi_scale.append(v_tap)
        if "downsample" in layer:
            H, Wd = cfg.stage_resolution(s)
            if isinstance(x, tuple):
                x = tuple(patch_merging_apply(layer["downsample"], xi, H, Wd) for xi in x)
            else:
                x = patch_merging_apply(layer["downsample"], x, H, Wd)
    return x, multi_scale


def backbone_apply(params, cfg: SwinConfig, a=None, v=None, v_nega=None,
                   collect_multiscale: bool = False):
    """Full backbone forward.

    Inputs (channel-last, TPU-native):
      v: (B, T, H, W, 3) video frames
      a: (B, T, F, Tt) fbank "images" (F=Tt=img_size)
      v_nega: optional negative visual stream (AVQA)

    Returns dict with normed token tensors per stream (+ multi_scale taps).
    ftmode routing mirrors Swin_AVE.py:1479-1599.
    """
    statics = backbone_statics(cfg)
    out: Dict[str, Any] = {}
    if cfg.ftmode == "videoonly":
        x, _, _ = patch_embed_apply(params["patch_embed"], v, cfg)
        x, _ = _run_layers(params, cfg, statics, x)
        out["v"] = layernorm_fused(params["norm"], x)
        return out
    if cfg.ftmode == "audioonly":
        a4 = a[..., None]  # (B, T, F, Tt, 1)
        x, _, _ = patch_embed_apply(params["patch_embed_audio"], a4, cfg)
        x, _ = _run_layers(params, cfg, statics, x)
        out["a"] = layernorm_fused(params["norm"], x)
        return out
    # multimodal / fusion
    vt, B, Tp = patch_embed_apply(params["patch_embed"], v, cfg)
    at, _, _ = patch_embed_apply(params["patch_embed_audio"], a[..., None], cfg)
    if v_nega is not None:
        nt, _, _ = patch_embed_apply(params["patch_embed"], v_nega, cfg)
        x = (vt, at, nt)
    else:
        x = (vt, at)
    x, multi_scale = _run_layers(params, cfg, statics, x,
                                 collect_multiscale=collect_multiscale)
    out["v"] = layernorm_fused(params["norm"], x[0])
    out["a"] = layernorm_fused(params["norm"], x[1])
    if v_nega is not None:
        out["v_nega"] = layernorm_fused(params["norm"], x[2])
    if collect_multiscale:
        out["multi_scale"] = multi_scale
    out["B"], out["T"] = B, Tp
    return out
