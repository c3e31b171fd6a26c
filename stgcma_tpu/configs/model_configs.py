"""Model configuration dataclasses + reference presets.

Presets mirror the driver configurations of the reference
(/root/reference/AVE/run_adapt_ave29.py:130-181, AVS/run_adapt_avs.py:142-185,
AVQA/run_adapt_avqa.py:284-301) without the triplicated per-task model files.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

FTMODES = ("videoonly", "audioonly", "multimodal", "fusion")


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin-2D adapter backbone (reference: AVE/model/Swin_AVE.py:1129-1599)."""

    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    img_size: int = 224
    # (pt, ph, pw) — reference always uses [1, 4, 4]
    patch_size: Tuple[int, int, int] = (1, 4, 4)
    num_frames: int = 10
    in_chans: int = 3
    adapter_ratios: Tuple[float, ...] = (0.25, 0.25, 0.25, 0.25)
    qkv_bias: bool = True
    ftmode: str = "fusion"
    label_dim: int = 29
    # 3rd plain stream for AVQA negatives (Swin_AVQAModel_V1.py:752-905)
    with_nega_stream: bool = False
    # LayerNorm eps (torch default)
    ln_eps: float = 1e-5
    # ablation switches (AVS/run_adapt_avs_ablation.sh variants /
    # Swin_AVSModel_without_adapt.py): disable temporal attention entirely,
    # or individual adapter branches (T = temporal, S = spatial, G = global/MLP)
    use_temporal_attn: bool = True
    use_t_adapter: bool = True
    use_s_adapter: bool = True
    use_g_adapter: bool = True
    # per-block rematerialization (jax.checkpoint) — the reference plumbs
    # use_checkpoint=False through BasicLayer (Swin_AVE.py:1047-1052)
    use_checkpoint: bool = False
    # lax.scan over (regular, shifted) block PAIRS for stages whose depth is
    # even and >= this threshold (0 disables). Within a stage all even blocks
    # share one BlockStatic and all odd blocks another, so scanning stacked
    # pair params is numerically identical to the unrolled loop while making
    # compile time O(1) in depth — this is what lets the full-depth (2,2,18,2)
    # train step trace/compile quickly on the virtual multichip CPU mesh.
    scan_blocks: int = 0

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        return (self.img_size // self.patch_size[1], self.img_size // self.patch_size[2])

    @property
    def num_ttokens(self) -> int:
        return self.num_frames // self.patch_size[0]

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2 ** i)

    def stage_resolution(self, i: int) -> Tuple[int, int]:
        pr = self.patches_resolution
        return (pr[0] // (2 ** i), pr[1] // (2 ** i))


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """CLIP visual tower + adapters (reference: AVE/model/CLIP_AVE.py:716-1140)."""

    embed_dim: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    input_resolution: int = 224
    num_frames: int = 10
    # audio fbank input is [T, audio_len, mel_bins] per clip-second;
    # reference: input_fdim=128 (mel bins), input_tdim=audio_length/10 (=102)
    audio_fdim: int = 128
    audio_tdim: int = 102
    adapter_ratio: float = 0.0625
    ftmode: str = "fusion"
    label_dim: int = 29
    ln_eps: float = 1e-5
    # lax.scan over the (homogeneous) resblocks when layers >= scan_blocks
    # (> 0 enables): O(1) compile/HLO size in depth, numerics == unrolled.
    # Counterpart of SwinConfig.scan_blocks; needed for L/14 train programs
    # that otherwise exceed the compile-relay request limit (BENCH_NOTES).
    scan_blocks: int = 0
    # per-block rematerialization under the scan (jax.checkpoint)
    use_checkpoint: bool = False

    @property
    def num_patches(self) -> int:
        return (self.input_resolution // self.patch_size) ** 2

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def audio_grid(self) -> Tuple[int, int]:
        # conv2d k=patch, s=patch, VALID on (fdim=102 rows?, ...)
        # reference forward feeds a as (BT, 1, audio_tdim, audio_fdim) = (BT,1,102,128):
        # rows=audio_tdim, cols=audio_fdim (CLIP_AVE.py:1109-1112); its get_shape_a uses
        # (fdim=128, tdim=102) names swapped but the product/patch-count matches.
        f = (self.audio_tdim - self.patch_size) // self.patch_size + 1
        t = (self.audio_fdim - self.patch_size) // self.patch_size + 1
        return (f, t)

    @property
    def num_patches_audio(self) -> int:
        f, t = self.audio_grid
        return f * t


@dataclasses.dataclass(frozen=True)
class AVSHeadConfig:
    """AVS segmentation decoder (reference: AVS/model/Swin_AVSModel.py:1473-1894)."""

    channel: int = 256
    vis_dim: Tuple[int, ...] = (64, 128, 320, 512)
    # per-stage visual feature dims coming out of the backbone (Large: 192/384/768/1536)
    stage_dims: Tuple[int, ...] = (192, 384, 768, 1536)
    stage_resolutions: Tuple[int, ...] = (56, 28, 14, 7)
    tpavi_stages: Tuple[int, ...] = (0, 1, 2, 3)
    tpavi_va_flag: bool = True
    tpavi_vv_flag: bool = False
    audio_dim: int = 1536
    tpavi_audio_dim: int = 128
    num_frames: int = 5


@dataclasses.dataclass(frozen=True)
class AVQAHeadConfig:
    """AVQA heads (reference: AVQA/model/Swin_AVQAModel_V1.py:1420-1473)."""

    feat_dim: int = 1536
    vocab_size: int = 93
    answer_dim: int = 42
    qst_word_embed: int = 1536
    qst_hidden: int = 1536
    qst_layers: int = 1
    attn_heads: int = 4
    # train-time dropout on the QA-head attention weights (reference
    # MultiheadAttention(1536, 4, dropout=0.1), Swin_AVQAModel_V1.py:1449-1450)
    attn_dropout: float = 0.1
    grid: int = 7
    num_frames: int = 10


# ---------------------------------------------------------------------------
# Presets (mirroring reference driver configs)
# ---------------------------------------------------------------------------

def swin_base(**kw) -> SwinConfig:
    """MM-Swin-*-Base (AVE/run_adapt_ave29.py:153-165)."""
    kw.setdefault("adapter_ratios", (0.125, 0.125, 0.0625, 0.0625))
    return SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), **kw)


def swin_large(**kw) -> SwinConfig:
    """MM-Swin-*-Large (AVE/run_adapt_ave29.py:167-181)."""
    kw.setdefault("adapter_ratios", (0.5, 0.25, 0.125, 0.0625))
    return SwinConfig(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), **kw)


def swin_tiny_test(**kw) -> SwinConfig:
    """Small config for CPU unit tests (not a reference preset)."""
    kw.setdefault("embed_dim", 16)
    kw.setdefault("depths", (2, 2))
    kw.setdefault("num_heads", (2, 4))
    kw.setdefault("img_size", 56)
    kw.setdefault("num_frames", 2)
    kw.setdefault("adapter_ratios", (0.25, 0.25))
    return SwinConfig(**kw)


def clip_b16(**kw) -> ClipConfig:
    kw.setdefault("adapter_ratio", 0.0625)
    return ClipConfig(embed_dim=768, layers=12, heads=12, patch_size=16, **kw)


def clip_l14(**kw) -> ClipConfig:
    kw.setdefault("adapter_ratio", 0.0625)
    return ClipConfig(embed_dim=1024, layers=24, heads=16, patch_size=14, **kw)


def clip_tiny_test(**kw) -> ClipConfig:
    kw.setdefault("embed_dim", 32)
    kw.setdefault("layers", 2)
    kw.setdefault("heads", 4)
    kw.setdefault("patch_size", 16)
    kw.setdefault("input_resolution", 64)
    kw.setdefault("num_frames", 2)
    kw.setdefault("audio_fdim", 64)
    kw.setdefault("audio_tdim", 48)
    kw.setdefault("adapter_ratio", 0.25)
    return ClipConfig(**kw)
