"""Micro-bench: int8 MXU dots inside Pallas vs bf16, at CLIP FFN shapes.

Questions to answer on v5e before committing to the int8-kernel design:
 1. Does int8 x int8 -> int32 `jax.lax.dot_general` lower inside Mosaic?
 2. What throughput does it achieve vs the same-shape bf16 dot?
 3. How much does fused per-row activation quant (abs-max/scale/round on the
    VPU, inside the kernel) cost on top?
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path.home() / ".cache/stgcma_jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(fn, args, n1, n2, label, reps=4):
    @functools.partial(jax.jit, static_argnums=(1,))
    def many(args, n):
        def body(c, _):
            x0 = args[0]
            out = fn((x0 + c.astype(x0.dtype)), *args[1:])
            return (out.astype(jnp.float32).mean() * 1e-9).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    float(many(args, n1)); float(many(args, n2))

    def tmin(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(many(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (tmin(n2) - tmin(n1)) / (n2 - n1)
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _mm_bf16_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _mm_int8_static_kernel(xq_ref, wq_ref, o_ref):
    # both operands already int8: pure MXU-rate probe
    acc = jax.lax.dot_general(xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.bfloat16)


def _mm_int8_statq_kernel(x_ref, wq_ref, ws_ref, o_ref):
    # static (calibrated) per-tensor activation scale: quant is just
    # mul-by-const + round + clip — no per-row abs-max reduction pass
    xf = x_ref[:].astype(jnp.float32)
    inv_s = 127.0 / 6.0          # stand-in calibrated scale constant
    xq = jnp.clip(jnp.round(xf * inv_s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * (1.0 / inv_s) * ws_ref[:]).astype(jnp.bfloat16)


def _mm_int8_dynq_kernel(x_ref, wq_ref, ws_ref, o_ref):
    # fused per-row activation quant + int8 dot + dequant
    xf = x_ref[:].astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-12) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf * pl.reciprocal(sx, approx=True)),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx * ws_ref[:]).astype(jnp.bfloat16)


def run(M, K, N, TM):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N) * 0.03, jnp.bfloat16)
    wq = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.rand(1, N) * 0.01, jnp.float32)
    xq = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)

    grid = (M // TM,)
    xspec = pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((TM, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    f_bf16 = lambda x, w: pl.pallas_call(
        _mm_bf16_kernel, out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid, in_specs=[xspec, wspec], out_specs=ospec,
        compiler_params=cp)(x, w)
    f_i8s = lambda xq, wq: pl.pallas_call(
        _mm_int8_static_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid, in_specs=[xspec, wspec], out_specs=ospec,
        compiler_params=cp)(xq, wq)
    f_i8sq = lambda x, wq, ws: pl.pallas_call(
        _mm_int8_statq_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid, in_specs=[xspec, wspec, wspec], out_specs=ospec,
        compiler_params=cp)(x, wq, ws)
    f_i8d = lambda x, wq, ws: pl.pallas_call(
        _mm_int8_dynq_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid, in_specs=[xspec, wspec, wspec], out_specs=ospec,
        compiler_params=cp)(x, wq, ws)

    fl = 2 * M * K * N
    print(f"\n== M={M} K={K} N={N} TM={TM} ({fl/1e9:.2f} GFLOP) ==")
    t = bench(f_bf16, (x, w), 4, 24, "  bf16 pallas dot")
    print(f"    -> {fl/t/1e12:.1f} TFLOP/s")
    try:
        t = bench(f_i8s, (xq, wq), 4, 24, "  int8 static dot")
        print(f"    -> {fl/t/1e12:.1f} TOPS")
    except Exception as e:
        print(f"  int8 static dot FAILED: {repr(e)[:300]}")
    try:
        t = bench(f_i8sq, (x, wq, ws), 4, 24, "  int8 static-quant dot")
        print(f"    -> {fl/t/1e12:.1f} TOPS-equiv")
    except Exception as e:
        print(f"  int8 static-quant FAILED: {repr(e)[:300]}")
    try:
        t = bench(f_i8d, (x, wq, ws), 4, 24, "  int8 dyn-quant dot")
        print(f"    -> {fl/t/1e12:.1f} TOPS-equiv")
    except Exception as e:
        print(f"  int8 dyn-quant FAILED: {repr(e)[:300]}")


if __name__ == "__main__":
    print(jax.devices())
    # CLIP-B FFN shape: rows = B*T*N = 8*10*197 padded -> 16384, K=768, N=3072
    run(16384, 768, 3072, 512)
    # qkv proj shape
    run(16384, 768, 2304, 512)
    # big square sanity
    run(4096, 4096, 4096, 512)
