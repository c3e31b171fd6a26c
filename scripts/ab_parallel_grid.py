"""A/B: 'parallel' grid dimension_semantics on the megakernels (VERDICT r4
#4 — the 10-15% Mosaic pipelining residual). 'arbitrary' (jax default)
forces a conservative cross-grid-step schedule; every megakernel grid here
is data-parallel over row tiles, so 'parallel' is sound and frees Mosaic to
double-buffer HBM<->VMEM across steps (ops/pallas_attn.py::_gsem).

    python scripts/ab_parallel_grid.py            # clip-b16 int8 B=8
    python scripts/ab_parallel_grid.py swin-base 8 bf16
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

model = sys.argv[1] if len(sys.argv) > 1 else "clip-b16"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
kind = sys.argv[3] if len(sys.argv) > 3 else "int8"

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stgcma_jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

for mode in ("0", "1", "0"):        # repeat baseline to bound chip drift
    os.environ["STGCMA_PARALLEL_GRID"] = mode
    jax.clear_caches()
    cps = bench._bench_infer(model, B, int8=(kind == "int8"))
    print(f"PARALLEL_GRID={mode} {model} {kind} B={B}: {cps:.1f} clips/s",
          flush=True)
