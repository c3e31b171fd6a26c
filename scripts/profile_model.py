"""Device-trace profiler: runs N forwards of an AVE fusion model under
jax.profiler and prints self-time per XLA op (the axon relay captures real
TPU op timings). Usage:
    python scripts/profile_model.py [clip-b16|swin-base] [depths e.g. 2,0,0,0]
"""
from __future__ import annotations

import collections
import dataclasses
import functools
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(tracedir: str, iters: int):
    path = sorted(glob.glob(os.path.join(
        tracedir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    meta = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            meta[(e["pid"], e["tid"])] = e["args"]["name"]
    X = [e for e in ev if e.get("ph") == "X"
         and meta.get((e["pid"], e["tid"])) == "XLA Ops"]
    X.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack, self_time, long_names = [], collections.Counter(), {}
    for e in X:
        ts, dur, name = e["ts"], e["dur"], e["name"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_time[stack[-1][2]] -= dur
        self_time[name] += dur
        long_names.setdefault(name, e.get("args", {}).get("long_name", ""))
        stack.append((ts, dur, name))
    print(f"-- self time per op (ms / iter, {iters} iters traced) --")
    total = sum(self_time.values()) / 1e3 / iters
    print(f"   total device self-time: {total:.2f} ms/iter")
    # aggregate by (op kind, shape) so the 12 per-block copies group together
    agg = collections.Counter()
    counts = collections.Counter()
    for name, d in self_time.items():
        ln = long_names.get(name, "")
        m = re.search(r"= (\S+) ", ln)
        shape = m.group(1) if m else ""
        kind = re.sub(r"[.\d]+$", "", name)
        agg[(kind, shape)] += d
        counts[(kind, shape)] += 1
    top = int(os.environ.get("PROFILE_TOP", "30"))
    for (kind, shape), d in agg.most_common(top):
        ms = d / 1e3 / iters
        if ms < 0.02:
            break
        print(f"{ms:8.3f}  x{counts[(kind, shape)]:3d}  {kind:22s} {shape[:70]}")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    model = sys.argv[1] if len(sys.argv) > 1 else "clip-b16"
    B = int(os.environ.get("BENCH_BATCH", "8"))
    rng = np.random.RandomState(0)
    if model == "swin-base":
        cfg = swin_base(ftmode="fusion", label_dim=29)
        if len(sys.argv) > 2:
            cfg = dataclasses.replace(
                cfg, depths=tuple(int(x) for x in sys.argv[2].split(",")))
        params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        apply_fn = ave.apply_swin_ave
        a = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size,
                                  cfg.img_size), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size,
                                  cfg.img_size, 3), jnp.bfloat16)
    else:
        cfg = clip_b16(ftmode="fusion", label_dim=29)
        params = cast_tree(ave.init_clip_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        apply_fn = ave.apply_clip_ave
        a = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.audio_tdim,
                                  cfg.audio_fdim), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.input_resolution,
                                  cfg.input_resolution, 3), jnp.bfloat16)

    if os.environ.get("INT8") == "1":
        from stgcma_tpu.ops.quant import (quantize_clip_tower,
                                          quantize_swin_tower)
        qf = quantize_swin_tower if model.startswith("swin") else quantize_clip_tower
        params = dict(params)
        params["backbone"] = qf(params["backbone"])

    ITERS = 4

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_many(params, a, v, n):
        def body(carry, _):
            logits = apply_fn(params, cfg,
                              a + (carry * 1e-8).astype(jnp.bfloat16), v)
            return logits.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    float(fwd_many(params, a, v, ITERS))
    import tempfile
    td = tempfile.mkdtemp(prefix="stgcma_trace_")
    jax.profiler.start_trace(td)
    float(fwd_many(params, a, v, ITERS))
    jax.profiler.stop_trace()
    summarize(td, ITERS)


if __name__ == "__main__":
    main()
