"""A/B: int8 attention grams inside the W8A8 kernels (VERDICT r4 #3).

The round-4 floor accounting prices the attention grams at bf16 (197 TOPS)
inside otherwise-int8 kernels; STGCMA_Q_INT8_GRAMS quantizes them (see
ops/pallas_attn.py::_int8_grams). Measures throughput for modes
('', 'qk', 'all') on the CLIP-B/16 int8 serving path + end-to-end fidelity
of each mode vs the bf16 model (the bench int8-fidelity methodology).

    python scripts/ab_int8_grams.py             # clip-b16, B=8
    python scripts/ab_int8_grams.py swin-base 8
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

model = sys.argv[1] if len(sys.argv) > 1 else "clip-b16"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stgcma_jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

import bench  # noqa: E402

for mode in ("", "qk", "all", ""):      # repeat baseline to bound chip drift
    os.environ["STGCMA_Q_INT8_GRAMS"] = mode
    jax.clear_caches()      # env knob is trace-time: force a fresh trace
    cps = bench._bench_infer(model, B, int8=True)
    print(f"Q_INT8_GRAMS={mode or 'off'} {model} int8 B={B}: "
          f"{cps:.1f} clips/s", flush=True)

# fidelity vs bf16 for the non-default modes
for mode in ("qk", "all"):
    os.environ["STGCMA_Q_INT8_GRAMS"] = mode
    rel, agree = bench._int8_fidelity(model, B)
    print(f"Q_INT8_GRAMS={mode} fidelity vs bf16: max_rel={rel:.4f} "
          f"top1_agree={agree}", flush=True)
