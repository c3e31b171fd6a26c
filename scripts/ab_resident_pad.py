"""A/B: resident-pad token layout (STGCMA_RESIDENT_PAD) on the CLIP-B/16
fusion serving path (see ops/pallas_attn.py::resident_pad_enabled).

The round-4 int8 trace attributes ~2.0 ms/iter of the 33 ms serving step to
the prime-197 pad/slice fallbacks (BENCH_NOTES); the resident layout pads
once after embed and should recover most of it. Run both orders to bound
the shared-relay chip drift:

    python scripts/ab_resident_pad.py 01   # off-then-on
    python scripts/ab_resident_pad.py 10   # on-then-off
"""
import os
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

order = sys.argv[1] if len(sys.argv) > 1 else "01"
which = sys.argv[2] if len(sys.argv) > 2 else "both"   # int8 | bf16 | both

import bench  # noqa: E402  (configures the compile cache)

for kind in (("int8", "bf16") if which == "both" else (which,)):
    for mode in order:
        os.environ["STGCMA_RESIDENT_PAD"] = mode
        cps = bench._bench_infer("clip-b16", 8, int8=(kind == "int8"))
        print(f"RESIDENT_PAD={mode} {kind}: {cps:.1f} clips/s", flush=True)
