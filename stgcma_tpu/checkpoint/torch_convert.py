"""PyTorch state-dict -> stgcma_tpu parameter-pytree converters.

Covers both directions the reference needs (SURVEY.md §5 checkpoint surgeries):

1. `load_pretrained_swin2d` — ImageNet-22k Swin checkpoints (2D conv patch embed):
   inflate patch_embed to 3D (/pt), derive the audio patch embed as the RGB mean,
   copy patch-embed norm (Swin_AVE.py:1369-1379).
2. `load_reference_swin` / `load_reference_clip` — full fine-tuned reference
   checkpoints (any task), including DataParallel 'module.' prefixes
   (AVS/test.py:149-156), adapters, gates, temporal bias tables, task heads.
3. `load_pretrained_clip` — OpenAI CLIP visual towers: conv1_audio = sum over RGB,
   positional_embedding_audio = center-crop/interp of the visual grid
   (CLIP_AVE.py:825-850).

All converters operate on numpy arrays (torch tensors are converted on entry),
produce flat {'a/b/c': array} dicts, and merge into an init-built param tree so
missing keys (fresh adapters) keep their init values — mirroring
`load_state_dict(strict=False)` + zero-init passes.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# pytree <-> flat path dict
# ---------------------------------------------------------------------------

def flatten_params(tree, prefix="") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def set_by_path(tree, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
    last = keys[-1]
    if isinstance(node, (list, tuple)):
        node[int(last)] = value
    else:
        node[last] = value


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# array-layout transforms
# ---------------------------------------------------------------------------

def t_linear(w):  # torch (out, in) -> (in, out)
    return _np(w).T


def t_conv2d(w):  # OIHW -> HWIO
    return _np(w).transpose(2, 3, 1, 0)


def t_conv3d(w):  # OIDHW -> DHWIO
    return _np(w).transpose(2, 3, 4, 1, 0)


def t_conv1x1_to_linear(w):
    """1x1(x1) conv weight (out, in, 1[,1[,1]]) -> linear kernel (in, out)."""
    w = _np(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def inflate_patch_embed(w2d, pt: int):
    """2D->3D patch-embed inflation: unsqueeze depth, repeat pt, / pt
    (Swin_AVE.py:1373-1374). (C,3,4,4) -> DHWIO (pt,4,4,3,C)."""
    w = _np(w2d)[:, :, None]  # (C, 3, 1, 4, 4)
    w = np.repeat(w, pt, axis=2) / pt
    return t_conv3d(w)


def audio_patch_embed_from_video(w2d, pt: int):
    """Audio patch embed = mean over RGB of the inflated video embed
    (Swin_AVE.py:1376). Returns DHWIO (pt,4,4,1,C).

    NOTE reference subtlety: the mean is taken over the *un-divided* unsqueezed
    weight — i.e. mean over dim=1 of (C,3,1,4,4) built from the ALREADY inflated
    weight (which was divided by pt). We replicate the exact composition:
    state_dict['patch_embed.proj.weight'] is first inflated (divided by pt),
    then `.unsqueeze(2)` + mean(dim=1) is applied to THAT tensor.
    """
    w = _np(w2d)[:, :, None]
    w = np.repeat(w, pt, axis=2) / pt          # inflated video weight (C,3,pt,4,4)
    wa = w.mean(axis=1, keepdims=True)         # (C,1,pt,4,4)
    return t_conv3d(wa)


# ---------------------------------------------------------------------------
# Swin key translation
# ---------------------------------------------------------------------------

_LN_NAMES = ("norm", "norm1", "norm2", "norm_layer", "ln", "ln_1", "ln_2",
             "ln_pre", "ln_post")

_SKIP_PATTERNS = (
    "relative_position_index", "relative_coords", "attn_mask",
    "t_relative_coords", "num_batches_tracked", "head.weight", "head.bias",
)


def _is_skipped(key: str) -> bool:
    return any(p in key for p in _SKIP_PATTERNS)


def translate_swin_key(key: str, value, prefix: str = "backbone/",
                       dual_head: bool = True) -> List[Tuple[str, np.ndarray]]:
    """Translate one reference Swin-model state-dict entry to (path, array) pairs.

    Handles backbone keys, AVE mlp_head, avstask_*, avqatask_* heads.
    Returns [] for buffers that have no parameter counterpart.
    """
    if key.startswith("module."):
        key = key[len("module."):]
    if _is_skipped(key):
        return []
    v = _np(value)

    # ---- task heads -------------------------------------------------------
    if key.startswith("avstask_"):
        return _translate_avs_key(key[len("avstask_"):], v)
    if key.startswith("avqatask_"):
        return _translate_avqa_key(key[len("avqatask_"):], v)
    if key.startswith("mlp_head."):
        return _translate_mlp_head(key, v, dual_head)

    # ---- backbone ---------------------------------------------------------
    parts = key.split(".")
    name, leaf = ".".join(parts[:-1]), parts[-1]

    if "patch_embed" in parts[0] and "proj" in key:
        stem = parts[0]
        if leaf == "weight":
            if v.ndim == 5:
                return [(f"{prefix}{stem}/proj/kernel", t_conv3d(v))]
            raise ValueError("2D patch embed needs load_pretrained_swin2d surgery")
        return [(f"{prefix}{stem}/proj/bias", v)]

    path = prefix + "/".join(parts[:-1])
    base = parts[-2] if len(parts) >= 2 else ""
    if leaf == "weight":
        if v.ndim == 1:  # LayerNorm
            return [(f"{path}/scale", v)]
        if v.ndim == 2:  # Linear (incl. reduction, qkv, D_fc*, fc*)
            return [(f"{path}/kernel", t_linear(v))]
        raise ValueError(f"unhandled weight shape {v.shape} for {key}")
    if leaf == "bias":
        return [(f"{path}/bias", v)]
    # parameter tensors addressed directly (bias tables, gates)
    return [(f"{prefix}{'/'.join(parts)}", v)]


def _translate_mlp_head(key: str, v, dual_head: bool):
    idx = key.split(".")[1]
    leaf = key.split(".")[2]
    if dual_head:  # Sequential(Linear, Dropout, Linear) (Swin_AVE.py:1320-1322)
        tgt = {"0": "fc1", "2": "fc2"}[idx]
        arr = t_linear(v) if leaf == "weight" else v
        return [(f"mlp_head/{tgt}/{'kernel' if leaf == 'weight' else 'bias'}", arr)]
    # Sequential(LayerNorm, Linear)
    if idx == "0":
        return [(f"mlp_head/ln/{'scale' if leaf == 'weight' else 'bias'}", v)]
    arr = t_linear(v) if leaf == "weight" else v
    return [(f"mlp_head/fc/{'kernel' if leaf == 'weight' else 'bias'}", arr)]


def _translate_avs_key(key: str, v):
    """avstask_* -> avstask/... (AVS/model/Swin_AVSModel.py:1473-1507)."""
    out_prefix = "avstask/"
    parts = key.split(".")
    leaf = parts[-1]

    # ASPP: conv{i}.conv2d_list.{k}.{weight,bias}
    m = re.match(r"conv(\d)\.conv2d_list\.(\d+)\.(weight|bias)", key)
    if m:
        i, k, wl = m.groups()
        arr = t_conv2d(v) if wl == "weight" else v
        return [(f"{out_prefix}conv{i}/convs/{k}/{'kernel' if wl == 'weight' else 'bias'}", arr)]

    # FPN paths: path{i}.resConfUnit{j}.conv{k}.{weight,bias}
    m = re.match(r"path(\d)\.resConfUnit(\d)\.conv(\d)\.(weight|bias)", key)
    if m:
        i, j, k, wl = m.groups()
        arr = t_conv2d(v) if wl == "weight" else v
        return [(f"{out_prefix}path{i}/resConfUnit{j}/conv{k}/"
                 f"{'kernel' if wl == 'weight' else 'bias'}", arr)]

    # output_conv Sequential indices 0,2,4
    m = re.match(r"output_conv\.(\d)\.(weight|bias)", key)
    if m:
        i, wl = m.groups()
        arr = t_conv2d(v) if wl == "weight" else v
        return [(f"{out_prefix}output_conv/conv{i}/"
                 f"{'kernel' if wl == 'weight' else 'bias'}", arr)]

    # TPAVI blocks
    m = re.match(r"tpavi_b(\d)\.(.+)", key)
    if m:
        i, rest = m.groups()
        return _translate_tpavi_key(rest, v, f"{out_prefix}tpavi_b{i}/")

    # linears: x{i}_linear, audio_linear
    if leaf == "weight" and v.ndim == 2:
        return [(f"{out_prefix}{'/'.join(parts[:-1])}/kernel", t_linear(v))]
    if leaf == "bias":
        return [(f"{out_prefix}{'/'.join(parts[:-1])}/bias", v)]
    return [(f"{out_prefix}{'/'.join(parts)}", v)]


def _translate_tpavi_key(key: str, v, prefix: str):
    """TPAVI 1x1x1 Conv3d -> linear; W_z Sequential(conv, bn) (TPAVI.py:37-73)."""
    parts = key.split(".")
    leaf = parts[-1]
    if parts[0] in ("g", "theta", "phi"):
        if leaf == "weight":
            return [(f"{prefix}{parts[0]}/kernel", t_conv1x1_to_linear(v))]
        return [(f"{prefix}{parts[0]}/bias", _np(v))]
    if parts[0] == "align_channel":
        arr = t_linear(v) if leaf == "weight" else _np(v)
        return [(f"{prefix}align_channel/{'kernel' if leaf == 'weight' else 'bias'}", arr)]
    if parts[0] == "norm_layer":
        return [(f"{prefix}norm_layer/{'scale' if leaf == 'weight' else 'bias'}", _np(v))]
    if parts[0] == "W_z":
        if parts[1] == "0":  # conv
            if leaf == "weight":
                return [(f"{prefix}W_z/conv/kernel", t_conv1x1_to_linear(v))]
            return [(f"{prefix}W_z/conv/bias", _np(v))]
        # bn
        tgt = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}[leaf]
        return [(f"{prefix}W_z/bn/{tgt}", _np(v))]
    raise ValueError(f"unhandled TPAVI key {key}")


def _translate_avqa_key(key: str, v):
    """avqatask_* -> avqatask/... (AVQA/model/Swin_AVQAModel_V1.py:1420-1473)."""
    out_prefix = "avqatask/"
    parts = key.split(".")
    leaf = parts[-1]

    # MHA attn_a/attn_v
    m = re.match(r"(attn_[av])\.(in_proj_weight|in_proj_bias|out_proj\.weight|out_proj\.bias)",
                 key)
    if m:
        name, rest = m.groups()
        if rest == "in_proj_weight":
            return [(f"{out_prefix}{name}/in_proj/kernel", t_linear(v))]
        if rest == "in_proj_bias":
            return [(f"{out_prefix}{name}/in_proj/bias", _np(v))]
        if rest == "out_proj.weight":
            return [(f"{out_prefix}{name}/out_proj/kernel", t_linear(v))]
        return [(f"{out_prefix}{name}/out_proj/bias", _np(v))]

    # question encoder
    if parts[0] == "question_encoder":
        sub = parts[1]
        if sub == "word2vec":
            return [(f"{out_prefix}question_encoder/word2vec", _np(v))]
        if sub == "lstm":
            m = re.match(r"(weight|bias)_(ih|hh)_l(\d+)", parts[2])
            kind, gate, layer = m.groups()
            tgt = f"{'w' if kind == 'weight' else 'b'}_{gate}"
            arr = t_linear(v) if kind == "weight" else _np(v)
            return [(f"{out_prefix}question_encoder/lstm/layers/{layer}/{tgt}", arr)]
        if sub == "fc":
            arr = t_linear(v) if leaf == "weight" else _np(v)
            return [(f"{out_prefix}question_encoder/fc/"
                     f"{'kernel' if leaf == 'weight' else 'bias'}", arr)]

    # norms
    if parts[0] in ("norm1", "norm2"):
        return [(f"{out_prefix}{parts[0]}/{'scale' if leaf == 'weight' else 'bias'}", _np(v))]

    # plain linears (fc_a2, fc_gl, fc1..4, linear11..22, fc_fusion, fc_ans)
    if leaf == "weight" and _np(v).ndim == 2:
        return [(f"{out_prefix}{'/'.join(parts[:-1])}/kernel", t_linear(v))]
    if leaf == "bias":
        return [(f"{out_prefix}{'/'.join(parts[:-1])}/bias", _np(v))]
    return [(f"{out_prefix}{'/'.join(parts)}", _np(v))]


# ---------------------------------------------------------------------------
# top-level loaders
# ---------------------------------------------------------------------------

def merge_into(params, flat_updates: Mapping[str, np.ndarray], strict_shapes=True):
    """Merge flat path->array updates into an init-built tree (in place); returns
    (params, missing_in_tree) where missing_in_tree lists update paths with no
    matching leaf (analogue of torch's unexpected_keys)."""
    existing = flatten_params(params)
    unexpected = []
    for path, arr in flat_updates.items():
        if path not in existing:
            unexpected.append(path)
            continue
        cur = existing[path]
        if strict_shapes and tuple(cur.shape) != tuple(arr.shape):
            raise ValueError(f"shape mismatch at {path}: tree {cur.shape} vs ckpt {arr.shape}")
        set_by_path(params, path, jnp.asarray(arr, dtype=jnp.float32))
    return params, unexpected


def load_pretrained_swin2d(params, state_dict, cfg, prefix="backbone/"):
    """Load an ImageNet-22k Swin checkpoint (timm layout, 2D patch embed) into an
    init tree, replicating Swin_AVE.py:1369-1379 surgeries. Adapters/gates/
    temporal tables keep their fresh init (reference loads strict=False then
    zero-inits D_fc2 — our init is already zero)."""
    pt = cfg.patch_size[0]
    flat: Dict[str, np.ndarray] = {}
    sd = {k: _np(v) for k, v in state_dict.items()}
    for key, v in sd.items():
        if key == "patch_embed.proj.weight":
            flat[f"{prefix}patch_embed/proj/kernel"] = inflate_patch_embed(v, pt)
            flat[f"{prefix}patch_embed_audio/proj/kernel"] = \
                audio_patch_embed_from_video(v, pt)
            continue
        if key == "patch_embed.proj.bias":
            flat[f"{prefix}patch_embed/proj/bias"] = v
            flat[f"{prefix}patch_embed_audio/proj/bias"] = v
            continue
        if key == "patch_embed.norm.weight":
            flat[f"{prefix}patch_embed/norm/scale"] = v
            flat[f"{prefix}patch_embed_audio/norm/scale"] = v
            continue
        if key == "patch_embed.norm.bias":
            flat[f"{prefix}patch_embed/norm/bias"] = v
            flat[f"{prefix}patch_embed_audio/norm/bias"] = v
            continue
        for path, arr in translate_swin_key(key, v, prefix=prefix):
            flat[path] = arr
    return merge_into(params, flat)


def load_reference_swin(params, state_dict, dual_head=True, prefix="backbone/"):
    """Load a full fine-tuned reference checkpoint (AVE/AVQA/AVS Swin model
    state_dict, possibly with DataParallel 'module.' prefixes)."""
    flat: Dict[str, np.ndarray] = {}
    for key, v in state_dict.items():
        for path, arr in translate_swin_key(key, v, prefix=prefix, dual_head=dual_head):
            flat[path] = arr
    return merge_into(params, flat)


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

def derive_clip_audio_pos_embed(pos_embed: np.ndarray, cfg) -> np.ndarray:
    """positional_embedding_audio from the visual pos embed: center-crop (or
    bilinear-interp) of the (grid x grid) map to the audio patch grid, keeping the
    class-token row (CLIP_AVE.py:828-850).

    The reference computes the crop with its get_shape_a dims
    (f=(128-16)/16+1, t=(102-16)/16+1 for B/16) — note these are transposed
    relative to the actual audio token grid; we replicate the exact arithmetic.
    """
    hw = cfg.grid
    d = cfg.embed_dim
    f_dim = (cfg.audio_fdim - 16) // cfg.patch_size + 1
    t_dim = (cfg.audio_tdim - 16) // cfg.patch_size + 1
    grid = pos_embed[1:].reshape(hw, hw, d)
    if t_dim <= hw:
        s = hw // 2 - t_dim // 2
        grid = grid[:, s:s + t_dim, :]
    else:
        raise NotImplementedError("audio grid wider than visual grid")
    if f_dim <= hw:
        s = hw // 2 - f_dim // 2
        grid = grid[s:s + f_dim, :, :]
    else:
        raise NotImplementedError("audio grid taller than visual grid")
    flat = grid.reshape(f_dim * t_dim, d)
    return np.concatenate([pos_embed[:1], flat], axis=0)


def load_pretrained_clip(params, visual_state_dict, cfg, prefix="backbone/"):
    """Load an OpenAI CLIP visual tower state_dict with audio surgeries
    (CLIP_AVE.py:816-850). 'proj' is dropped (reference deletes it)."""
    flat: Dict[str, np.ndarray] = {}
    sd = {k: _np(v) for k, v in visual_state_dict.items() if k != "proj"}
    for key, v in sd.items():
        if key == "conv1.weight":
            flat[f"{prefix}conv1/kernel"] = t_conv2d(v)
            flat[f"{prefix}conv1_audio/kernel"] = t_conv2d(
                v.sum(axis=1, keepdims=True))
            continue
        if key == "class_embedding":
            flat[f"{prefix}class_embedding"] = v
            continue
        if key == "positional_embedding":
            flat[f"{prefix}positional_embedding"] = v
            flat[f"{prefix}positional_embedding_audio"] = \
                derive_clip_audio_pos_embed(v, cfg)
            continue
        if key.startswith(("ln_pre", "ln_post")):
            stem, leaf = key.split(".")
            flat[f"{prefix}{stem}/{'scale' if leaf == 'weight' else 'bias'}"] = v
            continue
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", key)
        if m:
            i, rest = m.groups()
            flat.update(dict(_translate_clip_block_key(rest, v,
                                                       f"{prefix}resblocks/{i}/")))
            continue
        raise ValueError(f"unhandled CLIP key {key}")
    return merge_into(params, flat)


def _translate_clip_block_key(key: str, v, prefix: str):
    if key == "attn.in_proj_weight":
        return [(f"{prefix}attn/in_proj/kernel", t_linear(v))]
    if key == "attn.in_proj_bias":
        return [(f"{prefix}attn/in_proj/bias", _np(v))]
    if key == "attn.out_proj.weight":
        return [(f"{prefix}attn/out_proj/kernel", t_linear(v))]
    if key == "attn.out_proj.bias":
        return [(f"{prefix}attn/out_proj/bias", _np(v))]
    m = re.match(r"(ln_1|ln_2)\.(weight|bias)", key)
    if m:
        stem, leaf = m.groups()
        return [(f"{prefix}{stem}/{'scale' if leaf == 'weight' else 'bias'}", _np(v))]
    m = re.match(r"mlp\.(c_fc|c_proj)\.(weight|bias)", key)
    if m:
        stem, leaf = m.groups()
        arr = t_linear(v) if leaf == "weight" else _np(v)
        return [(f"{prefix}mlp/{stem}/{'kernel' if leaf == 'weight' else 'bias'}", arr)]
    raise ValueError(f"unhandled CLIP block key {key}")


def load_reference_clip(params, state_dict, cfg, dual_head=True, prefix="backbone/"):
    """Full fine-tuned MM_CLIP_AVE checkpoint -> param tree."""
    flat: Dict[str, np.ndarray] = {}
    for key, v in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        v = _np(v)
        if key.startswith("mlp_head."):
            for p_, a_ in _translate_mlp_head(key, v, dual_head):
                flat[p_] = a_
            continue
        if key in ("class_embedding", "positional_embedding",
                   "positional_embedding_audio", "temporal_embedding",
                   "temporal_embedding_audio"):
            flat[f"{prefix}{key}"] = v
            continue
        if key in ("conv1.weight", "conv1_audio.weight"):
            flat[f"{prefix}{key.split('.')[0]}/kernel"] = t_conv2d(v)
            continue
        m = re.match(r"(ln_pre|ln_post)\.(weight|bias)", key)
        if m:
            stem, leaf = m.groups()
            flat[f"{prefix}{stem}/{'scale' if leaf == 'weight' else 'bias'}"] = v
            continue
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", key)
        if m:
            i, rest = m.groups()
            # adapters/gates inside blocks use generic linear/gate translation
            sub = _translate_clip_block_generic(rest, v, f"{prefix}resblocks/{i}/")
            for p_, a_ in sub:
                flat[p_] = a_
            continue
        raise ValueError(f"unhandled reference CLIP key {key}")
    return merge_into(params, flat)


def _translate_clip_block_generic(key: str, v, prefix: str):
    try:
        return _translate_clip_block_key(key, v, prefix)
    except ValueError:
        pass
    parts = key.split(".")
    leaf = parts[-1]
    if key in ("gate_v", "gate_a"):
        return [(f"{prefix}{key}", _np(v))]
    if leaf == "weight" and _np(v).ndim == 2:
        return [(f"{prefix}{'/'.join(parts[:-1])}/kernel", t_linear(v))]
    if leaf == "bias":
        return [(f"{prefix}{'/'.join(parts[:-1])}/bias", _np(v))]
    return [(f"{prefix}{'/'.join(parts)}", _np(v))]


# ---------------------------------------------------------------------------
# ResNet-18 (grounding_gen visual backbone — torchvision layout)
# ---------------------------------------------------------------------------

def load_resnet18(params, state_dict, prefix=""):
    """torchvision resnet18 state_dict -> nn.resnet param tree (fc.* dropped)."""
    flat: Dict[str, np.ndarray] = {}
    bn_map = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}
    for key, v in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.startswith("fc.") or "num_batches_tracked" in key:
            continue
        v = _np(v)
        parts = key.split(".")
        if key.startswith("conv1."):
            flat[f"{prefix}conv1/kernel"] = t_conv2d(v)
        elif key.startswith("bn1."):
            flat[f"{prefix}bn1/{bn_map[parts[1]]}"] = v
        elif parts[0].startswith("layer"):
            layer, blk, mod, leaf = parts[0], parts[1], parts[2], parts[-1]
            base = f"{prefix}{layer}/{blk}/"
            if mod.startswith("conv"):
                flat[f"{base}{mod}/kernel"] = t_conv2d(v)
            elif mod.startswith("bn"):
                flat[f"{base}{mod}/{bn_map[leaf]}"] = v
            elif mod == "downsample":
                if parts[3] == "0":
                    flat[f"{base}downsample/conv/kernel"] = t_conv2d(v)
                else:
                    flat[f"{base}downsample/bn/{bn_map[leaf]}"] = v
        else:
            raise ValueError(f"unhandled resnet key {key}")
    return merge_into(params, flat)


# ---------------------------------------------------------------------------
# PVT-v2 (AVS baseline encoder — torchvision-style pvt_v2 layout)
# ---------------------------------------------------------------------------

def load_pvt_v2(params, state_dict, prefix=""):
    """pvt_v2_b* state_dict (AVS/model/pvt.py layout) -> nn.pvt param tree."""
    flat: Dict[str, np.ndarray] = {}
    for key, v in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.startswith("head."):
            continue
        v = _np(v)
        parts = key.split(".")
        leaf = parts[-1]
        m = re.match(r"patch_embed(\d)\.(proj|norm)\.(weight|bias)", key)
        if m:
            i, mod, wl = m.groups()
            if mod == "proj":
                arr = t_conv2d(v) if wl == "weight" else v
                flat[f"{prefix}patch_embed{i}/proj/"
                     f"{'kernel' if wl == 'weight' else 'bias'}"] = arr
            else:
                flat[f"{prefix}patch_embed{i}/norm/"
                     f"{'scale' if wl == 'weight' else 'bias'}"] = v
            continue
        m = re.match(r"norm(\d)\.(weight|bias)", key)
        if m:
            i, wl = m.groups()
            flat[f"{prefix}norm{i}/{'scale' if wl == 'weight' else 'bias'}"] = v
            continue
        m = re.match(r"block(\d)\.(\d+)\.(.+)", key)
        if m:
            i, j, rest = m.groups()
            base = f"{prefix}block{i}/{j}/"
            if rest.startswith(("norm1.", "norm2.")):
                stem, wl = rest.split(".")
                flat[f"{base}{stem}/{'scale' if wl == 'weight' else 'bias'}"] = v
            elif rest.startswith("attn.sr."):
                wl = rest.split(".")[-1]
                arr = t_conv2d(v) if wl == "weight" else v
                flat[f"{base}attn/sr/{'kernel' if wl == 'weight' else 'bias'}"] = arr
            elif rest.startswith("attn.norm."):
                wl = rest.split(".")[-1]
                flat[f"{base}attn/norm/{'scale' if wl == 'weight' else 'bias'}"] = v
            elif rest.startswith(("attn.q.", "attn.kv.", "attn.proj.")):
                _, stem, wl = rest.split(".")
                arr = t_linear(v) if wl == "weight" else v
                flat[f"{base}attn/{stem}/{'kernel' if wl == 'weight' else 'bias'}"] = arr
            elif rest.startswith("mlp.dwconv.dwconv."):
                wl = rest.split(".")[-1]
                if wl == "weight":  # (dim, 1, 3, 3) depthwise -> (3, 3, 1, dim)
                    flat[f"{base}mlp/dwconv/kernel"] = v.transpose(2, 3, 1, 0)
                else:
                    flat[f"{base}mlp/dwconv/bias"] = v
            elif rest.startswith(("mlp.fc1.", "mlp.fc2.")):
                _, stem, wl = rest.split(".")
                arr = t_linear(v) if wl == "weight" else v
                flat[f"{base}mlp/{stem}/{'kernel' if wl == 'weight' else 'bias'}"] = arr
            else:
                raise ValueError(f"unhandled pvt block key {key}")
            continue
        raise ValueError(f"unhandled pvt key {key}")
    return merge_into(params, flat)


# ---------------------------------------------------------------------------
# weight averaging (AVE/run_adapt_ave29.py:203-214)
# ---------------------------------------------------------------------------

def average_params(trees: List[Any]):
    """Elementwise average of parameter pytrees (post-train weight averaging)."""
    n = float(len(trees))
    return jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *trees)
