"""Batch-size sweep for the fusion flagships: clips/s at B in {8, 16, 32},
bf16 and int8, reusing bench._bench_infer's scan-differencing harness.

Usage: python scripts/sweep_batch.py [clip-b16|swin-base] [B ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "swin-base"
    batches = [int(b) for b in sys.argv[2:]] or [8, 16, 32]
    import bench
    for B in batches:
        for int8 in (False, True):
            try:
                cps = bench._bench_infer(model, B, int8=int8)
                print(f"{model} B={B} {'int8' if int8 else 'bf16'}: "
                      f"{cps:.2f} clips/s", flush=True)
            except Exception as e:
                print(f"{model} B={B} int8={int8}: ERROR {e!r}", flush=True)


if __name__ == "__main__":
    main()
