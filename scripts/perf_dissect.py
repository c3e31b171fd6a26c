"""Dissect AVE Swin-Base fusion forward cost on the TPU: per-component timing
via length-differenced on-device scan (cancels relay dispatch overhead)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import swin_base
from stgcma_tpu.models import ave
from stgcma_tpu.nn import swin
from stgcma_tpu.ops.common import cast_tree


def timed_scan(fn, args, n1=2, n2=10, reps=3):
    """Per-iteration seconds of fn(*args) measured on-device."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def many(args, n):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(lambda a: a, args))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(l.astype(jnp.float32).mean() for l in leaves)
            return c + s * 1e-9, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    float(many(args, n1)); float(many(args, n2))
    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(many(args, n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(n2) - t(n1)) / (n2 - n1)


def main():
    cfg = swin_base(ftmode="fusion", label_dim=29)
    params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    B = 8
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(B, cfg.num_frames, 224, 224), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, cfg.num_frames, 224, 224, 3), jnp.bfloat16)

    # full model
    dt = timed_scan(lambda p, a, v: ave.apply_swin_ave(p, cfg, a, v),
                    (params, a, v))
    print(f"full fusion fwd: {dt*1e3:.1f} ms/iter -> {B/dt:.1f} clips/s")

    # patch embed only
    dt = timed_scan(lambda p, v: swin.patch_embed_apply(p, v, cfg)[0],
                    (params["backbone"]["patch_embed"], v))
    print(f"patch embed: {dt*1e3:.2f} ms")

    # one block at each stage (fusion path), on correctly-shaped tokens
    statics = swin.backbone_statics(cfg)
    for s in range(4):
        st = statics[s][0]
        BT = B * cfg.num_ttokens
        x = jnp.asarray(rng.randn(BT, st.H * st.W, st.dim), jnp.bfloat16)
        bp = params["backbone"]["layers"][s]["blocks"][0]
        dt = timed_scan(lambda bp, xv, xa: swin.block_apply(bp, (xv, xa), st),
                        (bp, x, x))
        print(f"stage {s} t_attn block (dim {st.dim}, res {st.H}): {dt*1e3:.2f} ms "
              f"(x{cfg.depths[s]} blocks)")
        st1 = statics[s][1]
        bp1 = params["backbone"]["layers"][s]["blocks"][1]
        dt1 = timed_scan(lambda bp, xv, xa: swin.block_apply(bp, (xv, xa), st1),
                         (bp1, x, x))
        print(f"stage {s} shift block: {dt1*1e3:.2f} ms")

    # dense matmul of comparable size for calibration: (31360, 512) @ (512, 2048)
    m = jnp.asarray(rng.randn(31360, 512), jnp.bfloat16)
    w = jnp.asarray(rng.randn(512, 2048), jnp.bfloat16)
    dt = timed_scan(lambda m, w: (m @ w)[:, :512] @ w[:512, :], (m, w))
    gf = 2 * 31360 * 512 * 2048 * 2 / 1e9
    print(f"calib 2x dense matmul ({gf:.1f} GFLOP): {dt*1e3:.2f} ms "
          f"-> {gf/dt/1e3:.0f} TFLOP/s")


if __name__ == "__main__":
    main()
