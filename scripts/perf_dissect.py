"""Dissect AVE Swin-Base fusion forward cost on the TPU: per-component timing
via length-differenced on-device scan. The carry perturbs an input so XLA
cannot hoist the body out of the loop."""
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
    """fn(eps_scalar, *args) -> pytree. Returns per-iteration seconds."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def many(args, n):
        def body(c, _):
            out = fn(c.astype(jnp.bfloat16), *args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(l.astype(jnp.float32).mean() for l in leaves)
            return s * 1e-9, None
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

    dt = timed_scan(lambda e, p, a, v: ave.apply_swin_ave(p, cfg, a + e, v),
                    (params, a, v))
    print(f"full fusion fwd: {dt*1e3:.1f} ms/iter -> {B/dt:.1f} clips/s")

    dt = timed_scan(lambda e, p, v: swin.patch_embed_apply(p, v + e[..., None], cfg)[0],
                    (params["backbone"]["patch_embed"], v))
    print(f"patch embed: {dt*1e3:.2f} ms")

    statics = swin.backbone_statics(cfg)
    for s in range(4):
        BT = B * cfg.num_ttokens
        x = jnp.asarray(rng.randn(BT, statics[s][0].H * statics[s][0].W,
                                  statics[s][0].dim), jnp.bfloat16)
        for bi, name in ((0, "t_attn"), (1, "shift")):
            st = statics[s][bi]
            bp = params["backbone"]["layers"][s]["blocks"][bi]
            dt = timed_scan(
                lambda e, bp, xv, xa: swin.block_apply(bp, (xv + e, xa), st),
                (bp, x, x))
            print(f"stage {s} {name} block (dim {st.dim}, res {st.H}): "
                  f"{dt*1e3:.2f} ms (x{cfg.depths[s]//2} pairs)")

    m = jnp.asarray(rng.randn(31360, 512), jnp.bfloat16)
    w = jnp.asarray(rng.randn(512, 2048), jnp.bfloat16)
    dt = timed_scan(lambda e, m, w: ((m + e) @ w)[:, :512] @ w[:512, :], (m, w))
    gf = 2 * 31360 * 512 * 2048 * 2 / 1e9
    print(f"calib 2x dense matmul ({gf:.1f} GFLOP): {dt*1e3:.2f} ms "
          f"-> {gf/dt/1e3:.0f} TFLOP/s")


if __name__ == "__main__":
    main()
