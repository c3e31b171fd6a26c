"""A/B: dynamic-trip-count bench loop vs static-length lax.scan — NEGATIVE.

Probe motivation: bench programs are compiled once per differencing length
(static scan length), doubling the cold compile surface that sank
serving-device/swin-large on fresh hosts (VERDICT r3 weak #2). If the scan
length could be a TRACED int (fori_loop with a dynamic bound), ONE executable
would serve both lengths.

Measured on v5e (this script): dynamic-n 151.9 vs static-n 257.0 clips/s =
**-40.9%** on the int8 primary. A known trip count is load-bearing for XLA's
TPU loop optimizations (pipelining/double-buffering across iterations); a
dynamic bound reverts the loop to a conservative schedule. The probe is
disqualified for measurement — bench.py keeps static lengths, and the
cold-host story rides the persistent compile cache + scripts/warm_cache.py.

    python scripts/ab_dynlen.py            # CLIP-B/16 int8 B=8
    python scripts/ab_dynlen.py swin-base
"""
import functools
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (configures the compile cache)

model = sys.argv[1] if len(sys.argv) > 1 else "clip-b16"
B = 8

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# static-n leg: exactly what bench.py ships
ctx = bench._prep_infer(model, B, int8=True)
cps_static = bench._measure_infer(ctx)
print(f"static-n   {model} int8 B={B}: {cps_static:.1f} clips/s", flush=True)

# dynamic-n leg: same body, trip count as a traced int32. Reconstruct
# apply_fn/cfg from the shipped wrapper's closure cells (probe-only
# introspection) so both legs run the identical model program.
params, a, v = ctx["args"]
fwd_static = ctx["compiled"]  # keep alive; cells come from a fresh build
fwd_many, params2, a2, v2 = bench._build_infer(model, B, int8=True)
cells = {n: c.cell_contents for n, c in
         zip(fwd_many.__wrapped__.__code__.co_freevars,
             fwd_many.__wrapped__.__closure__)}
apply_fn, cfg = cells["apply_fn"], cells["cfg"]


@jax.jit
def fwd_dyn(params, a, v, n):
    def body(_i, carry):
        eps = (carry * 1e-8).astype(jnp.bfloat16)
        logits = apply_fn(params, cfg, a + eps, v + eps)
        return logits.astype(jnp.float32).mean() * 1e-6
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


exe = bench._aot(fwd_dyn, params2, a2, v2, np.int32(0))
per_iter = bench._timed_scan(lambda n: exe(params2, a2, v2, np.int32(n)))
cps_dyn = B / per_iter
print(f"dynamic-n  {model} int8 B={B}: {cps_dyn:.1f} clips/s", flush=True)
print(f"delta: {100.0 * (cps_dyn - cps_static) / cps_static:+.1f}%",
      flush=True)
