"""Streaming serving benchmark: raw WAVs on disk + packed frames ->
native host decode -> TPU-resident preprocess -> CLIP-B/16 AVE fusion model,
through serving.serve_stream (host decode double-buffered with device
compute).

Writes synthetic 10-s WAVs to /tmp, streams NUM_REQS requests, and reports
end-to-end clips/sec. NOTE: this container reaches the TPU through a relay
with ~0.5 s per-dispatch latency, which bounds per-batch round trips; use
BATCH=32 (default) to amortize. Run: python scripts/bench_serving.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
import wave as wavmod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_wav(path: str, seconds: float = 10.0, sr: int = 16000, seed: int = 0):
    rng = np.random.RandomState(seed)
    data = (rng.randn(int(seconds * sr)) * 3000).astype(np.int16)
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stgcma_tpu.configs import clip_b16
    from stgcma_tpu.data import transforms
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.fbank import CLIP_FBANK, fbank_image
    from stgcma_tpu.serving import (HostDecoder, MultiTaskServer,
                                    StreamRequest, serve_stream)

    B = int(os.environ.get("BATCH", "32"))
    NUM = int(os.environ.get("NUM_REQS", str(B * 6)))
    cfg = clip_b16(ftmode="fusion", label_dim=29)
    srv = MultiTaskServer()
    srv.add_clip_ave("ave29", cfg, ave.init_clip_ave(jax.random.PRNGKey(0), cfg))

    tmp = tempfile.mkdtemp(prefix="stgcma_serve_")
    wavs = []
    for i in range(8):
        p = os.path.join(tmp, f"clip{i}.wav")
        _write_wav(p, seed=i)
        wavs.append(p)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (cfg.num_frames, 256, 256, 3), dtype=np.uint8)
    reqs = [StreamRequest(task="ave29", wav_path=wavs[i % 8], frames=frames,
                          rid=i) for i in range(NUM)]

    import functools

    @jax.jit
    def pipe(batch):
        v = jax.vmap(lambda c: transforms.eval_transform(
            c, cfg.input_resolution))(batch["frames"])
        a = fbank_image(batch["wave"], CLIP_FBANK, cfg.audio_tdim,
                        -5.081, 4.485)
        return a, v

    def ave_pipeline(host):
        a, v = pipe({"frames": jnp.asarray(host["frames"]),
                     "wave": jnp.asarray(host["wave"])})
        return {"a": a, "v": v}

    dec = HostDecoder(num_segments=cfg.num_frames, seg_samples=16000)

    # warm-up (compile)
    warm = list(serve_stream(srv, {"ave29": ave_pipeline}, reqs[:B],
                             batch_size=B, decoder=dec))
    assert warm and np.isfinite(warm[0][1]).all()

    t0 = time.perf_counter()
    done = 0
    for rids, out in serve_stream(srv, {"ave29": ave_pipeline}, reqs,
                                  batch_size=B, decoder=dec):
        done += len(rids)
    dt = time.perf_counter() - t0
    print(f"serving: {done} clips in {dt:.2f}s -> {done/dt:.1f} clips/s "
          f"(batch={B}, CLIP-B/16 fusion, relay-dispatch bound)", flush=True)


if __name__ == "__main__":
    main()
