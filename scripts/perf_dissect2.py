"""Round 2 dissection: long scans so compute dominates relay jitter."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import swin_base
from stgcma_tpu.models import ave
from stgcma_tpu.nn import swin
from stgcma_tpu.ops.common import cast_tree


def bench(fn, args, n1, n2, label, reps=4):
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
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(many(args, n))
            vals.append(time.perf_counter() - t0)
        return min(vals), vals

    t1, v1 = t(n1)
    t2, v2 = t(n2)
    per = (t2 - t1) / (n2 - n1)
    print(f"{label}: {per*1e3:.3f} ms/iter  [t({n1})={t1:.3f}s t({n2})={t2:.3f}s]"
          f" raw1={['%.3f' % x for x in v1]} raw2={['%.3f' % x for x in v2]}",
          flush=True)
    return per


def main():
    cfg = swin_base(ftmode="fusion", label_dim=29)
    params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    B = 8
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(B, cfg.num_frames, 224, 224), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, cfg.num_frames, 224, 224, 3), jnp.bfloat16)

    per = bench(lambda e, p, a, v: ave.apply_swin_ave(p, cfg, a + e, v),
                (params, a, v), 2, 12, "full fusion fwd")
    print(f"  -> {B/per:.1f} clips/s", flush=True)

    bench(lambda e, p, v: swin.patch_embed_apply(p, v + e[..., None, None, None, None]
                                                 if False else v + e, cfg)[0],
          (params["backbone"]["patch_embed"], v), 8, 72, "patch embed")

    statics = swin.backbone_statics(cfg)
    for s in range(4):
        BT = B * cfg.num_ttokens
        x = jnp.asarray(rng.randn(BT, statics[s][0].H * statics[s][0].W,
                                  statics[s][0].dim), jnp.bfloat16)
        st0, st1 = statics[s][0], statics[s][1]
        bp0 = params["backbone"]["layers"][s]["blocks"][0]
        bp1 = params["backbone"]["layers"][s]["blocks"][1]
        def pair(e, bp0=bp0, bp1=bp1, st0=st0, st1=st1):
            def f(xv, xa):
                xv, xa = swin.block_apply(bp0, (xv, xa), st0)
                return swin.block_apply(bp1, (xv, xa), st1)
            return f
        dt = bench(lambda e, xv, xa, s=s: pair(e)(xv + e, xa), (x, x), 4, 36,
                   f"stage {s} block pair")
        print(f"  stage {s}: pairs={cfg.depths[s]//2} -> "
              f"{dt*1e3*cfg.depths[s]/2:.2f} ms/stage", flush=True)

    m = jnp.asarray(rng.randn(31360, 512), jnp.bfloat16)
    w = jnp.asarray(rng.randn(512, 2048), jnp.bfloat16)
    per = bench(lambda e, m, w: ((m + e) @ w)[:, :512] @ w[:512, :], (m, w),
                8, 72, "calib 2x dense matmul")
    gf = 2 * 31360 * 512 * 2048 * 2 / 1e9
    print(f"  -> {gf/per/1e3:.0f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
