"""Round-5 probe batch (VERDICT r4 #4/#5), one process to amortize startup:

  1. Swin-Base bf16 B=8: STGCMA_FUSED_FFN=0 vs 1 — the stage-0 FFN HBM
     round-trip (824 MB/FFN, BENCH_NOTES round-2 attribution) vs the Pallas
     VMEM-resident megakernel, measured on the shapes where the traffic is
     10x the CLIP case that lost by 3%.
  2. CLIP-B/16 int8 B=16 (resident-pad now default-on): the earlier B=16
     regression predates the VMEM-pressure changes — re-test.

    python scripts/ab_round5_probes.py
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stgcma_jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

for ffn in ("0", "1"):
    os.environ["STGCMA_FUSED_FFN"] = ffn
    jax.clear_caches()
    cps = bench._bench_infer("swin-base", 8, int8=False)
    print(f"FUSED_FFN={ffn} swin-base bf16 B=8: {cps:.1f} clips/s",
          flush=True)
os.environ.pop("STGCMA_FUSED_FFN", None)

jax.clear_caches()
for B in (16, 8):
    cps = bench._bench_infer("clip-b16", B, int8=True)
    print(f"clip-b16 int8 B={B} (resident-pad default): "
          f"{cps * 1.0:.1f} clips/s", flush=True)
