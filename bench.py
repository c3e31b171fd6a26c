"""Benchmark: AVE fusion inference throughput (AV clips/sec/chip) + extras.

North-star metric from BASELINE.json: >= 500 AV clips/sec/chip on v5e for
AVE-29 inference (10 frames video + 10 fbank seconds per clip, both 224x224,
through the full dual-stream fusion backbone + head), plus the TPU-resident
preprocess pipeline (fbank + frame transforms) in GB/s, plus training
steps/sec.

Measurement notes: this container reaches the chip through a relay with
~0.5 s per-dispatch latency and an unreliable block_until_ready, so the steady
state is measured on-device: a lax.scan chains N forwards with a data
dependence (carry perturbs the input, preventing CSE), and two scan lengths
are differenced to cancel the fixed dispatch+fetch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
The primary metric is the BASELINE.json configs[0] model (CLIP-B/16 fusion);
`extras` carries the preprocess-GB/s and train-steps/s companion metrics.
Env knobs: BENCH_MODEL=swin-base, BENCH_BATCH=N, BENCH_EXTRAS=0.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

try:
    import numpy as np
except ModuleNotFoundError:  # pragma: no cover
    # The image's bare `python` (/usr/local/bin) has no scientific stack;
    # the real interpreter lives in /opt/venv. Re-exec there so a driver
    # invoking plain `python bench.py` still gets a measurement.
    _venv = "/opt/venv/bin/python"
    if os.path.exists(_venv) and not os.environ.get("_STGCMA_REEXEC"):
        os.environ["_STGCMA_REEXEC"] = "1"
        os.execve(_venv, [_venv] + sys.argv, os.environ)
    raise


def _timed_scan(fn, reps=6, n_small=2, n_large=12):
    """Per-iteration steady-state time via scan-length differencing."""
    float(fn(n_small))
    float(fn(n_large))

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n_large) - timed(n_small)) / (n_large - n_small)


_OVERHEAD_S = None


def _dispatch_overhead(reps: int = 12) -> float:
    """Fixed per-dispatch host+relay latency (dispatch + scalar fetch),
    measured once on a trivial compiled program. Single-length extras
    subtract it instead of paying a second big compile for length
    differencing — the r4 artifact losses (serving-device, swin-large) were
    pure COLD-COMPILE surface, so every trailing extra now costs one
    program, not two. Call under _DEVICE_LOCK."""
    global _OVERHEAD_S
    if _OVERHEAD_S is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda x: x * 1.000001)
        x = jnp.float32(1.5)
        c = _aot(f, x)
        float(c(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(c(x))
            best = min(best, time.perf_counter() - t0)
        _OVERHEAD_S = best
    return _OVERHEAD_S


def _timed_single(fn_call, n: int, reps: int = 6) -> float:
    """Per-iteration time from ONE compiled scan length: subtract the
    calibrated dispatch overhead. Needs n large enough that the device
    section dominates (callers use n >= 6)."""
    ov = _dispatch_overhead()
    float(fn_call())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn_call())
        best = min(best, time.perf_counter() - t0)
    return max(best - ov, best * 0.05) / n


# ---------------------------------------------------------------------------
# background prep: every heavy bench stage is split into a PREP (build params
# + AOT lower/compile its programs — host/relay work) and a MEASURE (the timed
# device section). Preps run on daemon threads while earlier measures execute:
# the relay's minutes-long cold compiles overlap instead of serializing, which
# is what sank the round-3 artifact on fresh hosts (VERDICT r3 weak #2).
#
# Locking discipline:
#   _DEVICE_LOCK  — any device-touching work inside a prep (param init, cast,
#                   quantize) takes it so it can never perturb the main
#                   thread's timed scans (which hold it for their duration).
#   _TRACE_LOCK   — jit tracing reads process-global env knobs
#                   (STGCMA_EXACT_SOFTMAX, STGCMA_FUSED_ATTN); all prep
#                   lowers serialize under this lock so an env toggle in one
#                   prep can never leak into another's trace. compile() — the
#                   expensive relay call — happens OUTSIDE both locks.
# Measures call the AOT-compiled executables directly (no retrace), so env
# state at measure time is irrelevant.
# ---------------------------------------------------------------------------
import threading

_DEVICE_LOCK = threading.Lock()
_TRACE_LOCK = threading.Lock()


def _aot(jit_fn, *args, env: dict = None):
    """Trace+lower under the trace lock (optionally with env overrides held
    only for the trace), then compile on the relay outside all locks.
    Returns the compiled executable — call it with the DYNAMIC args only."""
    with _TRACE_LOCK:
        saved = {}
        if env:
            for k, v in env.items():
                saved[k] = os.environ.get(k)
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        try:
            lowered = jit_fn.lower(*args)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return lowered.compile()


class _DaemonPool:
    """Minimal ThreadPool with DAEMON workers: a wedged prep (relay hang)
    must never block process exit — the bench's stdout JSON is the round
    artifact and has to flush no matter what."""

    def __init__(self, n: int):
        import queue
        self._q = queue.Queue()
        for _ in range(n):
            threading.Thread(target=self._worker, daemon=True).start()

    def _worker(self):
        while True:
            fut, fn = self._q.get()
            if fut.set_running_or_notify_cancel():
                try:
                    fut.set_result(fn())
                except BaseException as e:  # noqa: BLE001 — surfaced via .result()
                    fut.set_exception(e)

    def submit(self, fn):
        from concurrent.futures import Future
        fut = Future()
        self._q.put((fut, fn))
        return fut


def _build_infer(model: str, B: int, int8: bool = False):
    """Params + inputs + the scanned forward for one flagship config.
    Device-touching: call under _DEVICE_LOCK from prep threads."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    rng = np.random.RandomState(0)
    if model.startswith("swin"):
        from stgcma_tpu.configs import swin_large
        mk = swin_large if model == "swin-large" else swin_base
        # pair-scan stage 2: measured neutral on v5e (67.0 vs 67.4 clips/s,
        # scripts/ab_scan_blocks.py) with 2.4x less compile — the Swin
        # programs were the bench's cold-compile hogs (VERDICT r4 #2)
        cfg = mk(ftmode="fusion", label_dim=29, scan_blocks=6)
        params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        apply_fn = ave.apply_swin_ave
        a_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size)
        v_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
    else:
        from stgcma_tpu.configs import clip_l14
        mk = clip_l14 if model == "clip-l14" else clip_b16
        cfg = mk(ftmode="fusion", label_dim=29)
        params = cast_tree(ave.init_clip_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        apply_fn = ave.apply_clip_ave
        a_shape = (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim)
        v_shape = (B, cfg.num_frames, cfg.input_resolution,
                   cfg.input_resolution, 3)

    if int8:
        from stgcma_tpu.ops.quant import (quantize_clip_tower,
                                          quantize_swin_tower)
        qf = quantize_swin_tower if model.startswith("swin") else quantize_clip_tower
        params = dict(params)
        params["backbone"] = qf(params["backbone"])

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_many(params, a, v, n):
        def body(carry, _):
            # BOTH independent input streams are carry-perturbed (ADVICE r2 /
            # VERDICT r3 #6): a loop-invariant v would let XLA hoist the video
            # patch-embed+pos-embed subgraph out of the scan
            eps = (carry * 1e-8).astype(jnp.bfloat16)
            logits = apply_fn(params, cfg, a + eps, v + eps)
            return logits.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*v_shape), jnp.bfloat16)
    return fwd_many, params, a, v


def _prep_infer(model: str, B: int, int8: bool = False,
                n_small: int = 2, n_large: int = 12):
    with _DEVICE_LOCK:
        fwd_many, params, a, v = _build_infer(model, B, int8)
    env = None
    cs = _aot(fwd_many, params, a, v, n_small, env=env)
    cl = _aot(fwd_many, params, a, v, n_large, env=env)
    return {"compiled": {n_small: cs, n_large: cl}, "args": (params, a, v),
            "B": B, "n": (n_small, n_large)}


def _measure_infer(ctx, reps: int = 6):
    ns, nl = ctx["n"]
    per_iter = _timed_scan(lambda n: ctx["compiled"][n](*ctx["args"]),
                           reps=reps, n_small=ns, n_large=nl)
    return ctx["B"] / per_iter


def _bench_infer(model: str, B: int, int8: bool = False):
    """Single-call form (scripts/, ad-hoc probes): prep + measure inline."""
    return _measure_infer(_prep_infer(model, B, int8))


def _prep_infer_single(model: str, B: int, int8: bool = False, n: int = 10,
                       env: dict = None):
    """One-program prep for trailing extras: a single scan length, measured
    with _measure_infer_single via dispatch-overhead subtraction. Halves the
    cold-compile surface vs the two-length pair."""
    with _DEVICE_LOCK:
        fwd_many, params, a, v = _build_infer(model, B, int8)
    compiled = _aot(fwd_many, params, a, v, n, env=env)
    return {"compiled": compiled, "args": (params, a, v), "B": B, "n": n}


def _measure_infer_single(ctx, reps: int = 6):
    per_iter = _timed_single(lambda: ctx["compiled"](*ctx["args"]),
                             ctx["n"], reps=reps)
    return ctx["B"] / per_iter


def _int8_fidelity(model: str, B: int):
    """Measured int8-vs-bf16 deviation of the SERVING path on device: max
    relative logit deviation + top-1 agreement over a random eval batch.
    Adapters/gates are randomized (zero-init adapters would leave the fusion
    paths dead and understate the deviation). This is the honest proxy for
    the AVE-accuracy delta absent real corpus checkpoints (VERDICT r2 #1)."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.quant import quantize_clip_tower, quantize_swin_tower

    rng = np.random.RandomState(7)
    from stgcma_tpu.ops.common import cast_tree
    with _DEVICE_LOCK:
        if model.startswith("swin"):
            cfg = swin_base(ftmode="fusion", label_dim=29)
            params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
            apply_fn, qf = ave.apply_swin_ave, quantize_swin_tower
            a_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size)
            v_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
        else:
            cfg = clip_b16(ftmode="fusion", label_dim=29)
            params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
            apply_fn, qf = ave.apply_clip_ave, quantize_clip_tower
            a_shape = (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim)
            v_shape = (B, cfg.num_frames, cfg.input_resolution,
                       cfg.input_resolution, 3)
        keys = iter(jax.random.split(jax.random.PRNGKey(11), 4096))
        params = jax.tree_util.tree_map(
            lambda x: jax.random.normal(next(keys), x.shape, jnp.float32) * 0.05
            if hasattr(x, "ndim") and x.ndim >= 1 else x, params)
        a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*v_shape), jnp.bfloat16)
        p16 = cast_tree(params, jnp.bfloat16)
        pq = dict(p16)
        pq["backbone"] = qf(params["backbone"])

    f = jax.jit(lambda p, a, v: apply_fn(p, cfg, a, v))
    c16 = _aot(f, p16, a, v)
    cq = _aot(f, pq, a, v)
    with _DEVICE_LOCK:          # execute (not a timing — lock is courtesy)
        ref = np.asarray(c16(p16, a, v), np.float32)
        out = np.asarray(cq(pq, a, v), np.float32)
    rel = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))
    agree = float((out.reshape(-1, out.shape[-1]).argmax(-1) ==
                   ref.reshape(-1, ref.shape[-1]).argmax(-1)).mean())
    return rel, agree


def _softmax_fidelity(model: str, B: int):
    """End-to-end deviation of the shipped approx numerics (single-exp
    bidirectional fusion softmax + approx-reciprocal multiplies) vs exact
    two-pass softmax, measured on the REAL bf16 forward on device. The test
    suite pins STGCMA_EXACT_SOFTMAX=1 for bitwise kernel parity, so this is
    the one place the default-path deviation is bounded every bench run."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    rng = np.random.RandomState(7)
    with _DEVICE_LOCK:
        if model.startswith("swin"):
            cfg = swin_base(ftmode="fusion", label_dim=29)
            params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
            apply_fn = ave.apply_swin_ave
            a_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size)
            v_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
        else:
            cfg = clip_b16(ftmode="fusion", label_dim=29)
            params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
            apply_fn = ave.apply_clip_ave
            a_shape = (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim)
            v_shape = (B, cfg.num_frames, cfg.input_resolution,
                       cfg.input_resolution, 3)
        keys = iter(jax.random.split(jax.random.PRNGKey(11), 4096))
        params = jax.tree_util.tree_map(
            lambda x: jax.random.normal(next(keys), x.shape, jnp.float32) * 0.05
            if hasattr(x, "ndim") and x.ndim >= 1 else x, params)
        p16 = cast_tree(params, jnp.bfloat16)
        a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*v_shape), jnp.bfloat16)

    # env is read at TRACE time inside the kernels — _aot holds the trace
    # lock while the override is set, so concurrent preps can't absorb it.
    # Distinct wrapper fns: identical jit identity + args would otherwise
    # dedupe to one program.
    f_exact = jax.jit(lambda p, a, v: apply_fn(p, cfg, a, v))
    f_approx = jax.jit(lambda p, a, v: apply_fn(p, cfg, a, v))
    c_exact = _aot(f_exact, p16, a, v, env={"STGCMA_EXACT_SOFTMAX": "1"})
    c_approx = _aot(f_approx, p16, a, v, env={"STGCMA_EXACT_SOFTMAX": "0"})
    with _DEVICE_LOCK:
        exact = np.asarray(c_exact(p16, a, v), np.float32)
        approx = np.asarray(c_approx(p16, a, v), np.float32)
    rel = float(np.abs(approx - exact).max() / max(np.abs(exact).max(), 1e-6))
    agree = float((approx.reshape(-1, approx.shape[-1]).argmax(-1) ==
                   exact.reshape(-1, exact.shape[-1]).argmax(-1)).mean())
    return rel, agree


def _prep_fidelity(model: str, B: int):
    """Merged fidelity prep (3 programs instead of the 4 the two separate
    specs paid): exact-softmax bf16, default(approx) bf16, and int8 — the
    approx-bf16 forward is shared as the int8 reference AND the softmax
    comparison point. Measure with _measure_fidelity -> list of two extras."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree
    from stgcma_tpu.ops.quant import quantize_clip_tower, quantize_swin_tower

    rng = np.random.RandomState(7)
    with _DEVICE_LOCK:
        if model.startswith("swin"):
            cfg = swin_base(ftmode="fusion", label_dim=29, scan_blocks=6)
            params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
            apply_fn, qf = ave.apply_swin_ave, quantize_swin_tower
            a_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size)
            v_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
        else:
            cfg = clip_b16(ftmode="fusion", label_dim=29)
            params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
            apply_fn, qf = ave.apply_clip_ave, quantize_clip_tower
            a_shape = (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim)
            v_shape = (B, cfg.num_frames, cfg.input_resolution,
                       cfg.input_resolution, 3)
        keys = iter(jax.random.split(jax.random.PRNGKey(11), 4096))
        # randomized adapters/gates: zero-init adapters would leave the
        # fusion paths dead and understate every deviation
        params = jax.tree_util.tree_map(
            lambda x: jax.random.normal(next(keys), x.shape, jnp.float32) * 0.05
            if hasattr(x, "ndim") and x.ndim >= 1 else x, params)
        a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*v_shape), jnp.bfloat16)
        p16 = cast_tree(params, jnp.bfloat16)
        pq = dict(p16)
        pq["backbone"] = qf(params["backbone"])

    f_exact = jax.jit(lambda p, a, v: apply_fn(p, cfg, a, v))
    f_approx = jax.jit(lambda p, a, v: apply_fn(p, cfg, a, v))
    f_int8 = jax.jit(lambda p, a, v: apply_fn(p, cfg, a, v))
    return {
        "exact": (_aot(f_exact, p16, a, v,
                       env={"STGCMA_EXACT_SOFTMAX": "1"}), (p16, a, v)),
        "approx": (_aot(f_approx, p16, a, v,
                        env={"STGCMA_EXACT_SOFTMAX": "0"}), (p16, a, v)),
        "int8": (_aot(f_int8, pq, a, v,
                      env={"STGCMA_EXACT_SOFTMAX": "0"}), (pq, a, v)),
        "label_dim": 29,
    }


def _measure_fidelity(ctx):
    # runs under _DEVICE_LOCK already (run_extras holds it around measures)
    outs = {}
    for k, v in ctx.items():
        if k == "label_dim":
            continue
        exe, args = v
        outs[k] = np.asarray(exe(*args), np.float32)

    def _cmp(out, ref):
        rel = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))
        agree = float((out.reshape(-1, out.shape[-1]).argmax(-1)
                       == ref.reshape(-1, ref.shape[-1]).argmax(-1)).mean())
        return rel, agree

    return _cmp(outs["int8"], outs["approx"]), _cmp(outs["approx"],
                                                    outs["exact"])


def _prep_preprocess(B: int, n: int = 12):
    """TPU-resident eval preprocess: uint8 frames + raw wave -> (a, v).
    Reports input GB/s (the BASELINE.json 'fbank+frame preprocess' metric).
    ONE program (dispatch-overhead-subtracted timing): the two-length pair
    cost 14 relay dispatches at measure time and blew its sub-budget when
    the relay ran at ~20 s/dispatch (observed 2026-08-21). Prep half —
    measure with _measure_preprocess."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.data import transforms
    from stgcma_tpu.ops.fbank import SWIN_FBANK, fbank_image

    rng = np.random.RandomState(1)
    T, S, sr = 10, 256, 16000
    with _DEVICE_LOCK:
        frames = jnp.asarray(rng.randint(0, 255, (B, T, S, S, 3)), jnp.uint8)
        wave = jnp.asarray(rng.randn(B, T, sr), jnp.float32)  # 1-s segments

    @functools.partial(jax.jit, static_argnums=(2,))
    def pipe_many(frames, wave, n):
        def body(carry, _):
            w = wave + carry * 1e-8
            # frames must ALSO be carry-perturbed — a loop-invariant frames
            # tensor lets XLA hoist the whole eval_transform chain out of the
            # scan, and length-differencing then cancels it from the timing
            # (the frames are ~75% of the bytes this bench credits)
            f = frames ^ (carry.astype(jnp.int32) & 1).astype(jnp.uint8)
            v = jax.vmap(lambda c: transforms.eval_transform(c, 224))(f)
            a = fbank_image(w, SWIN_FBANK, 224, -5.081, 4.485)
            return (a.astype(jnp.float32).mean() * 1e-6
                    + v.astype(jnp.float32).mean() * 1e-6), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    compiled = _aot(pipe_many, frames, wave, n)
    return {"compiled": compiled, "args": (frames, wave), "n": n,
            "in_bytes": frames.size + wave.size * 4, "B": B}


def _measure_preprocess(ctx):
    per_iter = _timed_single(lambda: ctx["compiled"](*ctx["args"]),
                             ctx["n"], reps=4)
    return (ctx["in_bytes"] / per_iter) / 1e9, ctx["B"] / per_iter


def _prep_serving_device(B: int = 2):
    """Multi-task serving rate on PRE-STAGED device batches (VERDICT r2 #10):
    one Swin-Base frozen tower shared by AVE + AVQA + AVS heads
    (serving.share_frozen_tower buffer aliasing), one batch of each task
    dispatched round-robin at reference shapes (AVE T=10, AVQA T=10
    3 streams, AVS T=5). Decoupled from the relay/host-decode transfer —
    this is the achievable aggregate dispatch rate of the multi-task server.

    Each task is timed as its OWN program (round-robin dispatch is serial
    anyway); all six are AOT-compiled in this prep — the round-3
    single-program formulation compiled all three Swin task graphs in one
    XLA invocation and blew the bench budget on fresh hosts (VERDICT r3
    weak #2). Measure with _measure_serving_device ->
    (clips_per_sec_aggregate, per_task_rates_dict)."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import AVQAHeadConfig, AVSHeadConfig, swin_base
    from stgcma_tpu.models import ave, avqa, avs
    from stgcma_tpu.ops.common import cast_tree
    from stgcma_tpu.serving import share_frozen_tower

    rng = np.random.RandomState(3)
    cfg_ave = swin_base(ftmode="fusion", label_dim=29, scan_blocks=6)
    cfg_avqa = swin_base(ftmode="fusion", num_frames=10,
                         with_nega_stream=True, scan_blocks=6)
    cfg_avs = swin_base(ftmode="fusion", num_frames=5, scan_blocks=6)
    h_avqa = AVQAHeadConfig(feat_dim=cfg_avqa.num_features, grid=7,
                            num_frames=10)
    h_avs = AVSHeadConfig(
        stage_dims=tuple(cfg_avs.stage_dim(i) for i in range(4)),
        audio_dim=cfg_avs.num_features, num_frames=5)

    with _DEVICE_LOCK:
        p_ave = ave.init_swin_ave(jax.random.PRNGKey(0), cfg_ave)
        p_avqa = avqa.init_avqa(jax.random.PRNGKey(1), cfg_avqa, h_avqa)
        p_avs = avs.init_avs(jax.random.PRNGKey(2), cfg_avs, h_avs)
        shared = share_frozen_tower(p_ave, {"avqa": p_avqa, "avs": p_avs})
        p_ave = cast_tree(p_ave, jnp.bfloat16)
        p_avqa = cast_tree(shared["avqa"], jnp.bfloat16)
        p_avs = cast_tree(shared["avs"], jnp.bfloat16)

        S = cfg_ave.img_size
        f16 = jnp.bfloat16
        a_ave = jnp.asarray(rng.randn(B, 10, S, S), f16)
        v_ave = jnp.asarray(rng.randn(B, 10, S, S, 3), f16)
        a_q = jnp.asarray(rng.randn(B, 10, S, S), f16)
        v_q = jnp.asarray(rng.randn(B, 10, S, S, 3), f16)
        vn_q = jnp.asarray(rng.randn(B, 10, S, S, 3), f16)
        q_ids = jnp.asarray(rng.randint(0, 93, (B, 14)), jnp.int32)
        a_s = jnp.asarray(rng.randn(B, 5, S, S), f16)
        v_s = jnp.asarray(rng.randn(B, 5, S, S, 3), f16)

    @functools.partial(jax.jit, static_argnums=(3,))
    def serve_ave(p, a, v, n):
        def body(carry, _):
            eps = (carry * 1e-8).astype(f16)
            out = ave.apply_swin_ave(p, cfg_ave, a + eps, v + eps)
            return out.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    @functools.partial(jax.jit, static_argnums=(5,))
    def serve_avqa(p, a, v, vn, qi, n):
        def body(carry, _):
            eps = (carry * 1e-8).astype(f16)
            # every independent input stream must be carry-perturbed,
            # including the int question ids (never-true branch), or XLA
            # hoists that subgraph out of the scan (see ADVICE r2)
            qip = jnp.where(carry > 1e30, qi + 1, qi)
            qa, m_posi, _ = avqa.apply_avqa(p, cfg_avqa, h_avqa, a + eps,
                                            v + eps, vn + eps, qip)
            return (qa.astype(jnp.float32).mean() +
                    m_posi.astype(jnp.float32).mean()) * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    @functools.partial(jax.jit, static_argnums=(3,))
    def serve_avs(p, a, v, n):
        def body(carry, _):
            eps = (carry * 1e-8).astype(f16)
            pred, _, _ = avs.apply_avs(p, cfg_avs, h_avs, a + eps, v + eps)
            return pred.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    tasks = {
        "ave": (serve_ave, (p_ave, a_ave, v_ave)),
        "avqa": (serve_avqa, (p_avqa, a_q, v_q, vn_q, q_ids)),
        "avs": (serve_avs, (p_avs, a_s, v_s)),
    }
    # ONE program per task measured via dispatch-overhead subtraction: the
    # r3/r4 artifact losses were this prep's 6-program cold-compile surface
    # (VERDICT r4 #2) — now 3 programs, each with a pair-scanned stage 2
    # (another 2.4x compile cut, measured perf-neutral). n=16 keeps the
    # device section several x the ~0.5 s dispatch overhead being subtracted.
    N_SERVE = 16
    compiled = {}
    for t, (fn, args) in tasks.items():
        compiled[t] = (_aot(fn, *args, N_SERVE), args)
    return {"compiled": compiled, "B": B, "n": N_SERVE}


def _measure_serving_device(ctx):
    B = ctx["B"]
    n = ctx["n"]
    times = {}
    for t, (exe, args) in ctx["compiled"].items():
        times[t] = _timed_single(lambda: exe(*args), n, reps=4)
    agg = 3 * B / sum(times.values())
    rates = {t: round(B / dt, 2) for t, dt in times.items()}
    return agg, rates


def _bench_host_decode(n_imgs: int = 256, size: int = 256):
    """Host JPEG-decode throughput (VERDICT r3 #4): the stage BEFORE the
    TPU-resident preprocess. Measures the native multithreaded decoder
    (native/stgcma_host.cc, libjpeg-turbo) on photographic-noise JPEGs at
    AVE frame geometry. Returns (frames_per_sec, decoded GB/s, ok_fraction).
    Raises if the native library isn't built — the bench host must `make -C
    native` (driver hosts have g++)."""
    import subprocess
    import tempfile

    from stgcma_tpu.data import native_io
    if not native_io.image_available():
        # build on the fly: the .so is a 2 s g++ compile
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(["make", "-C", os.path.join(here, "native")],
                       check=True, capture_output=True)
        native_io._lib = None  # force re-probe
        if not native_io.image_available():
            raise RuntimeError("native image decode unavailable after build")

    from PIL import Image
    rng = np.random.RandomState(5)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        # low-frequency content + noise ~ photographic entropy (pure noise
        # over-stresses entropy decode; flat gray under-stresses it)
        base = rng.rand(size // 8, size // 8, 3)
        for i in range(n_imgs):
            img = np.kron(base, np.ones((8, 8, 1)))
            img = img * 127 + rng.rand(size, size, 3) * 64
            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(td, f"f{i}.jpg"), quality=90)
            paths.append(os.path.join(td, f"f{i}.jpg"))
        nt = os.cpu_count() or 8
        # warm page cache + thread pool
        native_io.decode_image_batch(paths, size, size, num_threads=nt)
        reps = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 2.0:
            frames, ok = native_io.decode_image_batch(paths, size, size,
                                                      num_threads=nt)
            reps += 1
        dt = time.perf_counter() - t0
        fps = reps * n_imgs / dt
        gbs = fps * frames[0].nbytes / 1e9
        return fps, gbs, float(ok.mean())


def _prep_train(model: str, B: int):
    """Steady-state full training step (fwd+bwd+Adam update), steps/sec.
    Prep half — measure with _measure_train."""
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.train.losses import ave_loss

    rng = np.random.RandomState(2)
    with _DEVICE_LOCK:
        if model.startswith("swin"):
            from stgcma_tpu.configs import swin_large
            mk = swin_large if model == "swin-large" else swin_base
            cfg = mk(ftmode="fusion", label_dim=29, scan_blocks=6)
            params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
            apply_fn = ave.apply_swin_ave
            a_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size)
            v_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
        else:
            from stgcma_tpu.configs import clip_l14
            mk = clip_l14 if model == "clip-l14" else clip_b16
            cfg = mk(ftmode="fusion", label_dim=29)
            if model == "clip-l14":
                # the unrolled 24-block fwd+bwd HLO exceeds the compile
                # relay's request-size limit (HTTP 413) — scan the resblocks
                # instead. use_checkpoint remats each scanned block: without
                # it the scan saves every block's intermediates for bwd and
                # the L/14 dual stream OOMs v5e HBM (19.9G vs 15.75G)
                import dataclasses
                cfg = dataclasses.replace(cfg, scan_blocks=8,
                                          use_checkpoint=True)
            params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
            if model == "clip-l14":
                # pre-stack block params so Adam/cast plumbing is one op per
                # weight, not one per weight per block (~930 -> ~90 leaves)
                from stgcma_tpu.nn.clip_vit import stack_resblocks
                params = stack_resblocks(params)
            apply_fn = ave.apply_clip_ave
            a_shape = (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim)
            v_shape = (B, cfg.num_frames, cfg.input_resolution,
                       cfg.input_resolution, 3)

        labels = jnp.asarray(rng.rand(B, 10, 29) > 0.9, jnp.float32)
        a = jnp.asarray(rng.randn(*a_shape), jnp.float32)
        v = jnp.asarray(rng.randn(*v_shape), jnp.float32)

        from stgcma_tpu.train.optim import build_optimizer, merge_params
        from stgcma_tpu.train.steps import init_train_state
        tx = build_optimizer(params, base_lr=5e-4, head_lr_mult=10.0)
        train_params, frozen_params, opt_state, _ = init_train_state(params, tx)
        frozen_bf16 = jax.tree_util.tree_map(
            lambda x: None if x is None else x.astype(jnp.bfloat16),
            frozen_params, is_leaf=lambda x: x is None)

    def loss_fn(tp, frozen16, a, v):
        tp16 = jax.tree_util.tree_map(
            lambda x: None if x is None else x.astype(jnp.bfloat16), tp,
            is_leaf=lambda x: x is None)
        p = merge_params(tp16, frozen16)
        logits = apply_fn(p, cfg, a.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16))
        return ave_loss(logits, labels)

    import optax

    # frozen params MUST be a jit argument, not a closure capture: captured
    # arrays are baked into the lowered module as dense constants, and the
    # L/14 tower's ~600 MB of bf16 weights then exceeds the compile relay's
    # request-size limit (HTTP 413)
    @functools.partial(jax.jit, static_argnums=(4,))
    def train_many(train_params, frozen16, opt_state, av, n):
        a, v = av

        def body(carry, _):
            tp, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(tp, frozen16, a, v)
            grads = jax.tree_util.tree_map(
                lambda g: None if g is None else g.astype(jnp.float32), grads,
                is_leaf=lambda x: x is None)
            updates, st2 = tx.update(grads, st, tp)
            return (optax.apply_updates(tp, updates), st2), loss
        (train_params, opt_state), losses = jax.lax.scan(
            body, (train_params, opt_state), None, length=n)
        return losses.mean()

    # L/14 kernel payloads push the fwd+bwd program past the compile relay's
    # request limit even under the resblock scan (~10 MB of Mosaic MLIR vs a
    # 3.4 MB kernel-free program — BENCH_NOTES); trace the train step on the
    # XLA path for that model only. The kernels' custom VJPs recompute the
    # naive path in bwd anyway, so this changes fwd fusion only.
    env = {"STGCMA_FUSED_ATTN": "0"} if model == "clip-l14" else None
    args = (train_params, frozen_bf16, opt_state, (a, v))
    compiled = {n: _aot(train_many, *args, n, env=env) for n in (1, 5)}
    return {"compiled": compiled, "args": args}


def _measure_train(ctx):
    per_iter = _timed_scan(lambda n: ctx["compiled"][n](*ctx["args"]),
                           reps=3, n_small=1, n_large=5)
    return 1.0 / per_iter


def _bench_train(model: str, B: int):
    """Single-call form (scripts/, ad-hoc probes): prep + measure inline."""
    return _measure_train(_prep_train(model, B))


# minimum useful slot for one extra; anything smaller is recorded as skipped
EXTRA_MIN_SLOT_S = 30.0
# per-later-extra reserve: scheduling extra i leaves this much budget for
# each extra after it, so one slow compile can time out only ITSELF
# (VERDICT r3 weak #2: serving-device ate the whole residual budget and
# softmax-fidelity never ran)
EXTRA_RESERVE_S = 100.0


def _submit_window(specs, futs, pool, upto: int):
    """Ensure preps for specs[0:upto] are submitted. The sliding window
    bounds how many built-but-unmeasured contexts (device params) sit
    resident at once."""
    for label, _cap, prep, _m, _r in specs[:upto]:
        if prep is not None and label not in futs:
            futs[label] = pool.submit(prep)
    return futs


def run_extras(specs, extras, budget_s, t_start,
               clock=time.perf_counter,
               reserve_s=EXTRA_RESERVE_S, min_slot_s=EXTRA_MIN_SLOT_S,
               pool=None, futs=None, prefetch: int = 4):
    """Run each (label, cap_s, prep, measure, render) spec under its own
    SIGALRM sub-budget: min(cap_s, remaining - reserve_for_later).

    Preps (param build + AOT compile) run on daemon threads `prefetch` specs
    ahead of the measure cursor, so the relay's minutes-long cold compiles
    overlap earlier measures instead of serializing (the round-3 artifact
    loss — VERDICT r3 weak #2). Measures run on the main thread holding
    _DEVICE_LOCK so in-flight preps cannot perturb the timings. Every spec
    produces exactly one entry in `extras` — a rendered value, an error, or
    an explicit skipped marker — so an absent metric is always visible.

    Second-chance pass: a spec whose slot expired while WAITING on its prep
    keeps its daemon thread compiling; after the last spec, any such prep
    that has since finished is re-measured inside the leftover budget and
    its error entry replaced (a fresh host's minutes-long Swin compile can
    outlive any sane per-extra slot, but the RELAY does the waiting — the
    measure itself is cheap once the executable exists). Timeouts that hit
    MID-MEASURE (relay dispatch-latency spikes) keep their built executable
    and re-measure in the leftover budget; inline (prep-less) specs that
    timed out while prep threads starved the core re-run once the queue has
    drained. A prep that FAILED surfaces its real exception in the entry."""
    import signal

    if pool is None:
        pool = _DaemonPool(int(os.environ.get("BENCH_PREP_THREADS", "4")))
    futs = futs if futs is not None else {}
    retry = []   # (extras index, label, cap_s, measure, render)
    retry_ctx = {}  # label -> built ctx whose MEASURE timed out (executable
    #                 exists; re-measuring in the leftover budget is cheap)

    for i, (label, cap_s, prep, measure, render) in enumerate(specs):
        ctx = None
        _submit_window(specs, futs, pool, i + 1 + prefetch)
        remaining = budget_s - (clock() - t_start)
        n_later = len(specs) - i - 1
        slot = min(float(cap_s), remaining - reserve_s * n_later)
        if slot < min_slot_s:
            # less than a useful slot — but never below a floor share of
            # what IS left, so trailing extras still get their reserve
            slot = min(float(cap_s), max(remaining / (n_later + 1), 0.0))
        if slot < min_slot_s and not (prep is not None and label in futs):
            extras.append({"metric": label,
                           "error": "skipped: bench budget exhausted"})
            continue
        if slot < min_slot_s:
            # prep already in flight — record the skip but keep it eligible
            # for the second-chance pass below
            extras.append({"metric": label,
                           "error": "skipped: bench budget exhausted"})
            retry.append((len(extras) - 1, label, cap_s, measure, render))
            continue

        def _alarm(signum, frame):
            raise TimeoutError(f"{label} exceeded its {int(slot)}s sub-budget")
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(int(slot), 1))
        try:
            if prep is not None:
                ctx = futs[label].result()
                futs.pop(label)
                with _DEVICE_LOCK:
                    r = render(measure(ctx))
                extras.extend(r) if isinstance(r, list) else extras.append(r)
                del ctx          # free the context's device buffers
            else:
                with _DEVICE_LOCK:
                    r = render(measure())
                extras.extend(r) if isinstance(r, list) else extras.append(r)
        except Exception as e:
            extras.append({"metric": label, "error": repr(e)[:200]})
            if prep is not None and label in futs \
                    and (not futs[label].done()
                         or futs[label].exception() is None):
                # timed out waiting on the prep — the prep thread keeps
                # going; try again at the end (done() guard:
                # Future.exception() BLOCKS until completion)
                retry.append((len(extras) - 1, label, cap_s, measure, render))
            elif ctx is not None and isinstance(e, TimeoutError):
                # prep SUCCEEDED and the measure itself overran the slot
                # (e.g. relay dispatch latency spikes) — keep the built
                # executable and re-measure in the leftover budget
                retry_ctx[label] = ctx
                retry.append((len(extras) - 1, label, cap_s, measure, render))
            elif prep is None and isinstance(e, TimeoutError):
                # inline host-side spec (no prep): starved by concurrent
                # prep-thread tracing — re-run once the queue has drained
                retry.append((len(extras) - 1, label, cap_s, measure, render))
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    # descending index order: a list-render splice (e.g. the merged fidelity
    # spec) grows `extras` in place and must not shift earlier retry indices
    retry.sort(key=lambda t: -t[0])
    for j, (idx, label, cap_s, measure, render) in enumerate(retry):
        fut = futs.get(label)
        ctx = retry_ctx.get(label)
        inline = ctx is None and fut is None and label not in retry_ctx
        if ctx is None and fut is not None and fut.done() \
                and fut.exception() is not None:
            # prep failed — surface the REAL prep exception instead of the
            # stale waiting-timeout entry
            extras[idx] = {"metric": label, "error": "prep failed: "
                           + repr(fut.exception())[:180]}
            continue
        remaining = budget_s - (clock() - t_start)
        n_later = len(retry) - j - 1
        slot = min(float(cap_s), remaining - reserve_s * n_later)
        if slot < min_slot_s:
            slot = min(float(cap_s), max(remaining / (n_later + 1), 0.0))
        if slot < min_slot_s:
            continue    # keep the original error entry

        def _alarm(signum, frame):
            raise TimeoutError(f"{label} exceeded its {int(slot)}s retry slot")
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(int(slot), 1))
        try:
            if ctx is None and fut is not None:
                ctx = fut.result()   # blocks under the alarm while compiling
                futs.pop(label)
            with _DEVICE_LOCK:
                r = render(measure() if inline else measure(ctx))
                extras[idx:idx + 1] = r if isinstance(r, list) else [r]
            retry_ctx.pop(label, None)
            del ctx
        except Exception as e:
            extras[idx] = {"metric": label,
                           "error": repr(e)[:200] + " (retry)"}
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # BASELINE.json configs[0] is "AVE-29: CLIP ViT-B/16 + STG-CMA adapter";
    # BENCH_MODEL=swin-base measures the windowed Swin flagship instead
    # (see BENCH_NOTES.md for both numbers).
    model = os.environ.get("BENCH_MODEL", "clip-b16")
    B = int(os.environ.get("BENCH_BATCH", "8"))
    name = {"swin-base": "Swin-Base", "swin-large": "Swin-Large",
            "clip-l14": "CLIP-L/14"}.get(model, "CLIP-B/16")
    dev = jax.devices()[0]

    t_start = time.perf_counter()
    # Primary = the production serving configuration: int8 frozen towers
    # inside the Pallas megakernels (measured fidelity: top-1 agreement 1.0,
    # max rel logit dev ~2% vs bf16 — reported in the extras every run).
    # bf16 is reported alongside as an extra. BENCH_PRIMARY=bf16 restores the
    # bf16 primary.
    primary_int8 = os.environ.get("BENCH_PRIMARY", "int8") == "int8"
    want_extras = os.environ.get("BENCH_EXTRAS", "1") == "1"

    pool = _DaemonPool(int(os.environ.get("BENCH_PREP_THREADS", "4")))
    # primary prewarm: bf16 + int8 compile CONCURRENTLY on the prep pool
    # (the bf16 point is only REPORTED in the extras block, so don't pay it
    # on a BENCH_EXTRAS=0 int8-primary quick run)
    want_bf16 = not (primary_int8 and not want_extras)
    fut_bf16 = (pool.submit(lambda: _prep_infer(model, B))
                if want_bf16 else None)
    fut_int8 = (pool.submit(lambda: _prep_infer(model, B, int8=True))
                if primary_int8 else None)

    specs = []
    if want_extras:
        if not primary_int8 and os.environ.get("BENCH_INT8", "1") == "1":
            specs.append((
                "int8", 300,
                lambda: _prep_infer(model, B, int8=True), _measure_infer,
                lambda cps8: {
                    "metric": f"AVE {name} fusion inference, int8 frozen "
                              f"towers (serving mode, batch={B})",
                    "value": round(cps8, 2), "unit": "clips/sec/chip"}))
        if os.environ.get("BENCH_INT8", "1") == "1":
            specs.append((
                "fidelity", 300,
                lambda: _prep_fidelity(model, B), _measure_fidelity,
                lambda r: [
                    {"metric": f"int8 serving fidelity vs bf16 ({name}, "
                               "randomized adapters)",
                     "max_rel_logit_dev": round(r[0][0], 4),
                     "top1_agreement": round(r[0][1], 4)},
                    {"metric": "approx-softmax fidelity vs exact two-pass "
                               f"({name}, bf16, randomized adapters)",
                     "max_rel_logit_dev": round(r[1][0], 5),
                     "top1_agreement": round(r[1][1], 4)}]))
        # faithful-numerics co-primary (VERDICT r4 #7): bf16 + exact softmax
        # is the <=1e-3-fidelity class of the north-star; tracked per round
        # with its own vs_baseline alongside the int8 primary
        specs.append((
            "bf16-exact", 240,
            lambda: _prep_infer_single(model, B, int8=False, n=24,
                                       env={"STGCMA_EXACT_SOFTMAX": "1"}),
            _measure_infer_single,
            lambda cps: {
                "metric": f"AVE {name} fusion inference, bf16 + exact "
                          f"softmax (faithful-numerics serving, batch={B})",
                "value": round(cps, 2), "unit": "clips/sec/chip",
                "vs_baseline": round(cps / 500.0, 3)}))
        specs.append((
            "preprocess", 240,
            lambda: _prep_preprocess(B), _measure_preprocess,
            lambda r: {
                "metric": "TPU-resident fbank+frame preprocess throughput",
                "value": round(r[0], 3), "unit": "GB/s",
                "clips_per_sec": round(r[1], 1)}))
        # n_imgs 128 + cap 150: the inline JPEG-encode half runs on the main
        # thread CONCURRENTLY with daemon-prep tracing — on a 1-core host the
        # 256-image encode starved past the old 90 s slot (2026-08-21)
        specs.append((
            "host-decode", 150, None,
            lambda: _bench_host_decode(n_imgs=128),
            lambda r: {
                "metric": "host JPEG decode throughput (native C, "
                          f"{os.cpu_count()} threads, 256^2 q90)",
                "value": round(r[0], 1), "unit": "frames/sec",
                "decoded_gb_per_sec": round(r[1], 3),
                "ok_fraction": r[2]}))
        specs.append((
            "train", 300,
            lambda: _prep_train(
                model, int(os.environ.get("BENCH_TRAIN_BATCH", "2"))),
            _measure_train,
            lambda sps: {
                "metric": f"AVE {name} fusion train step "
                          f"(fwd+bwd+Adam, B=2, bf16)",
                "value": round(sps, 3), "unit": "steps/sec"}))
        if os.environ.get("BENCH_SERVING", "1") == "1":
            specs.append((
                "serving-device", 420,
                lambda: _prep_serving_device(
                    int(os.environ.get("BENCH_SERVING_BATCH", "2"))),
                _measure_serving_device,
                lambda r: {
                    "metric": "multi-task serving clips/s "
                              "(device-resident, shared Swin-Base tower,"
                              " AVE+AVQA+AVS round-robin)",
                    "value": round(r[0], 2), "unit": "clips/sec/chip",
                    "per_task_clips_per_sec": r[1]}))
        # standing flagship points (VERDICT r3 #5, r4 #2/#5): the reference's
        # headline accuracy configs tracked per round. ONE program each
        # (dispatch-overhead-subtracted timing) + pair-scanned Swin stage 2:
        # the 2-program-per-point cold-compile surface is what kept these as
        # TimeoutError entries in r3/r4.
        if os.environ.get("BENCH_FLAGSHIPS", "1") == "1" and model == "clip-b16":
            specs.append((
                "clip-l14-int8", 300,
                lambda: _prep_infer_single("clip-l14", B, int8=True),
                _measure_infer_single,
                lambda cps: {
                    "metric": "AVE CLIP-L/14 fusion inference, int8 serving "
                              f"(batch={B})",
                    "value": round(cps, 2), "unit": "clips/sec/chip"}))
            specs.append((
                "swin-base-int8", 240,
                lambda: _prep_infer_single("swin-base", B, int8=True),
                _measure_infer_single,
                lambda cps: {
                    "metric": "AVE Swin-Base fusion inference, int8 serving "
                              f"(batch={B})",
                    "value": round(cps, 2), "unit": "clips/sec/chip"}))
            specs.append((
                "swin-large-int8", 300,
                lambda: _prep_infer_single("swin-large", 4, int8=True),
                _measure_infer_single,
                lambda cps: {
                    "metric": "AVE Swin-Large fusion inference, int8 serving "
                              "(batch=4)",
                    "value": round(cps, 2), "unit": "clips/sec/chip"}))

    # extras preps start compiling NOW, overlapping the primary's own compile
    # wait + measures. The window stays BOUNDED: a warm cache load is ~35 s
    # per program THROUGH THE RELAY, and an unbounded submit (tried round 5)
    # starves the primary's own loads/measures of relay bandwidth — the
    # primary then eats the whole budget and every extra reports skipped.
    futs = _submit_window(specs, {}, pool, 4)

    bf16_clips_per_sec = None
    if fut_bf16 is not None:
        ctx = fut_bf16.result()
        with _DEVICE_LOCK:
            bf16_clips_per_sec = _measure_infer(ctx)
        del ctx
    if primary_int8:
        ctx = fut_int8.result()
        with _DEVICE_LOCK:
            clips_per_sec = _measure_infer(ctx)
        del ctx
    else:
        clips_per_sec = bf16_clips_per_sec

    # calibrate the per-dispatch overhead now (cheap) so single-program
    # extras never pay it inside their own sub-budget slots
    with _DEVICE_LOCK:
        _dispatch_overhead()

    # extras run inside a wall-clock budget so a cold compile through the
    # relay can never sink the whole bench (the primary metric is out by
    # now). Floor: however long the primary phase took (relay degradation,
    # warm-load stalls), the extras always get BENCH_EXTRAS_MIN_S of their
    # own — a skipped-everything artifact (round-5 warm rerun) is worse than
    # a slightly longer bench.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    elapsed = time.perf_counter() - t_start
    budget_s = max(budget_s,
                   elapsed + float(os.environ.get("BENCH_EXTRAS_MIN_S",
                                                  "700")))

    extras = []
    if want_extras:
        if primary_int8:
            extras.append({
                "metric": f"AVE {name} fusion inference, bf16 (batch={B})",
                "value": round(bf16_clips_per_sec, 2),
                "unit": "clips/sec/chip"})
        run_extras(specs, extras, budget_s, t_start, pool=pool, futs=futs)

    prec = ("int8 serving mode, fused W8A8 megakernels" if primary_int8
            else "bf16")
    print(json.dumps({
        "metric": f"AVE {name} fusion inference throughput "
                  f"({prec}, batch={B}, on-device steady state, "
                  f"{dev.device_kind})",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / 500.0, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
    # daemon prep threads may still sit inside TPU-client/relay calls;
    # normal interpreter teardown aborts on them ("FATAL: exception not
    # rethrown", nonzero rc — observed round 4). The artifact is the stdout
    # JSON, already flushed — skip destructors.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
