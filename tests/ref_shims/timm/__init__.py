"""Minimal timm shim — just enough for the reference model files to import.

The reference models (/root/reference/*/model/*.py) import
`timm` and `from timm.models.layers import DropPath, to_2tuple, trunc_normal_`;
no other timm surface is touched at model-construction or forward time.
"""
from . import models  # noqa: F401
