"""A/B: SwinConfig.scan_blocks on the Swin-Base int8 serving program.

The bench's Swin programs (serving-device, swin-large-int8) unroll all 18
stage-2 blocks (swin_base presets default scan_blocks=0); the pair-scan
(nn/swin.py::_run_layers) is numerically identical with O(1) compile in
depth. This measures BOTH sides of the trade on the real chip:
  - cold compile wall time per program (fresh cache dir)
  - steady-state clips/s
to decide whether the bench's cold-host compile surface (VERDICT r4 #2)
can ride the scan. Usage:

    python scripts/ab_scan_blocks.py            # scans (0, 6) int8 B=8
    python scripts/ab_scan_blocks.py 6,2 bf16 4
"""
import dataclasses
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

scans = tuple(int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "0,6").split(","))
kind = sys.argv[2] if len(sys.argv) > 2 else "int8"
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# fresh cache dir: compile timings must be cold
cache = tempfile.mkdtemp(prefix="stgcma_ab_scan_")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools  # noqa: E402

import bench  # noqa: E402
from stgcma_tpu.configs import swin_base  # noqa: E402
from stgcma_tpu.models import ave  # noqa: E402
from stgcma_tpu.ops.common import cast_tree  # noqa: E402
from stgcma_tpu.ops.quant import quantize_swin_tower  # noqa: E402

rng = np.random.RandomState(0)
for scan in scans:
    cfg = swin_base(ftmode="fusion", label_dim=29, scan_blocks=scan)
    params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    if kind == "int8":
        params = dict(params)
        params["backbone"] = quantize_swin_tower(params["backbone"])

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_many(params, a, v, n, cfg=cfg):
        def body(carry, _):
            eps = (carry * 1e-8).astype(jnp.bfloat16)
            logits = ave.apply_swin_ave(params, cfg, a + eps, v + eps)
            return logits.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    a = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size, cfg.img_size),
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size, cfg.img_size, 3),
                    jnp.bfloat16)
    compiled = {}
    for n in (2, 12):
        t0 = time.perf_counter()
        compiled[n] = bench._aot(fwd_many, params, a, v, n)
        print(f"scan_blocks={scan} {kind} B={B}: compile(n={n}) "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    per_iter = bench._timed_scan(lambda n: compiled[n](params, a, v))
    print(f"scan_blocks={scan} {kind} B={B}: {B / per_iter:.1f} clips/s",
          flush=True)
