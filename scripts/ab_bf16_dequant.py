"""A/B: bf16 dequant chain in the int8 kernels (STGCMA_Q_BF16_DEQUANT,
VERDICT r3 #1c probe — see ops/pallas_attn.py::_bf16_dequant).

The round-4 floor accounting attributes part of the kernels' 66-93%
pipelining quality to the in-tile serial VPU chain (LN -> quant -> dequant);
this probe halves the dequant multiply volume IF Mosaic packs bf16 lanes 2x
on v5e. Also prints end-to-end logit deviation vs the fp32-dequant path.

    python scripts/ab_bf16_dequant.py 01   # off-then-on
    python scripts/ab_bf16_dequant.py 10   # on-then-off
"""
import os
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

order = sys.argv[1] if len(sys.argv) > 1 else "01"

import bench  # noqa: E402  (configures the compile cache)

for mode in order:
    os.environ["STGCMA_Q_BF16_DEQUANT"] = mode
    cps = bench._bench_infer("clip-b16", 8, int8=True)
    print(f"Q_BF16_DEQUANT={mode} int8: {cps:.1f} clips/s", flush=True)
