"""Device-trace profile of one full training step (fwd+bwd+Adam) — prints
self-time per XLA op. Usage: python scripts/profile_train.py [swin-base] [B]
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_model import summarize  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _bench_train

    model = sys.argv[1] if len(sys.argv) > 1 else "swin-base"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    # _bench_train warms + times with scans of length 1 and 5; trace the
    # whole call and divide by the total scanned steps (2*(1+5)+1+5=...).
    # Simpler: warm once (compile), then trace a second full call.
    td = tempfile.mkdtemp(prefix="stgcma_train_trace_")
    _bench_train(model, B)          # compile + warm
    jax.profiler.start_trace(td)
    _bench_train(model, B)          # all steps traced
    jax.profiler.stop_trace()
    # _bench_train runs scans of n=1 and n=5: 2 warm calls + 3 reps * 2
    # timed calls = (1+5)*(1+3) = 24 steps traced in total
    summarize(td, 24)


if __name__ == "__main__":
    main()
