"""stgcma_tpu — a TPU-native (JAX/XLA/Pallas) audio-visual adaptation framework.

From-scratch rebuild of the capabilities of kaiw7/STG-CMA (parameter-efficient
spatio-temporal-global cross-modal adaptation of frozen CLIP-ViT / Swin backbones
to AVE-29 / MUSIC-AVQA / AVSBench tasks), designed TPU-first:

- single parameterized backbone + task-head plugins (vs. 3 forked task dirs)
- pure-functional modules: explicit parameter pytrees + jit-compiled apply fns
- bf16 MXU compute path, fp32 softmax/LayerNorm
- batched TPU-resident preprocessing (Kaldi-compatible fbank, fused clip transforms)
- pjit/shard_map data/tensor parallel over `jax.sharding.Mesh`
- PyTorch-checkpoint converters reproducing every reference weight surgery
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("STGCMA_PLATFORM"):
    # honor the platform override for ANY package entry point (the axon image
    # pins jax_platforms to the TPU plugin at interpreter start, so a plain
    # JAX_PLATFORMS env var is ignored)
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["STGCMA_PLATFORM"])
