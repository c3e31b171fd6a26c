"""Shared CLI plumbing: model construction by reference model-type names,
seeding, arg archiving. Preserves the reference's public model identifiers
(BASELINE.json): MM-Swin-AVE-{Base,Large}, MM-CLIP-AVE-{Base,Large},
MM-Swin-AVQA-Large, MM-Swin-AVS-{Base,Large}.
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import random
from typing import Any, Dict

import numpy as np
import jax

from ..configs import (AVQAHeadConfig, AVSHeadConfig, clip_b16, clip_l14,
                       swin_base, swin_large)

# The axon image pins jax_platforms to the TPU plugin at interpreter start;
# STGCMA_PLATFORM=cpu (etc.) lets CLI users override it.
if os.environ.get("STGCMA_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["STGCMA_PLATFORM"])


def str2bool(v):
    return ast.literal_eval(str(v).capitalize()) if isinstance(v, str) else bool(v)


def seed_everything(seed: int = 0):
    """Fixed seed 0 like the reference (AVE/run_adapt_ave29.py:86-89)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def archive_args(args, exp_dir: str):
    """args.pkl + args.json experiment archive (AVE/run_adapt_ave29.py:193-196)."""
    import pickle
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "args.pkl"), "wb") as f:
        pickle.dump(args, f)
    with open(os.path.join(exp_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=1, default=str)


def build_ave_model(model_type: str, ftmode: str, label_dim: int,
                    adapter_ratios=None, num_frames: int = 10):
    """-> (flavor, cfg). flavor in {'swin', 'clip'}."""
    if model_type == "MM-Swin-AVE-Base":
        cfg = swin_base(ftmode=ftmode, label_dim=label_dim, num_frames=num_frames,
                        **({"adapter_ratios": tuple(adapter_ratios)}
                           if adapter_ratios else {}))
        return "swin", cfg
    if model_type == "MM-Swin-AVE-Large":
        cfg = swin_large(ftmode=ftmode, label_dim=label_dim, num_frames=num_frames,
                         **({"adapter_ratios": tuple(adapter_ratios)}
                            if adapter_ratios else {}))
        return "swin", cfg
    if model_type == "MM-CLIP-AVE-Base":
        return "clip", clip_b16(ftmode=ftmode, label_dim=label_dim,
                                num_frames=num_frames)
    if model_type == "MM-CLIP-AVE-Large":
        return "clip", clip_l14(ftmode=ftmode, label_dim=label_dim,
                                num_frames=num_frames)
    raise ValueError(f"unknown model type {model_type}")


def maybe_load_pretrained(params, pretrained: str, flavor: str, cfg):
    """Load a torch pretrained checkpoint if given (requires torch available)."""
    if not pretrained:
        return params
    import torch
    from ..checkpoint import torch_convert as TC
    ckpt = torch.load(pretrained, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if flavor == "swin":
        full, unexpected = TC.load_pretrained_swin2d(params, sd, cfg)
        print(f"loaded {pretrained}; unexpected keys: {len(unexpected)}")
        return full
    full, unexpected = TC.load_pretrained_clip(params, sd, cfg)
    print(f"loaded {pretrained}; unexpected keys: {len(unexpected)}")
    return full
