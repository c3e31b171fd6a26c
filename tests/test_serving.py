"""Multi-task server: shared frozen tower aliasing + per-task dispatch."""
import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import AVSHeadConfig, swin_tiny_test
from stgcma_tpu.models import ave, avs
from stgcma_tpu.serving import MultiTaskServer, share_frozen_tower


def test_share_frozen_tower_aliases_buffers():
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    p_ave = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    hcfg = AVSHeadConfig(stage_dims=(16, 32), stage_resolutions=(14, 7),
                         vis_dim=(64, 128), tpavi_stages=(0,),
                         audio_dim=32, num_frames=2)
    p_avs = avs.init_avs(jax.random.PRNGKey(1), cfg, hcfg)

    shared = share_frozen_tower(p_ave, {"avs": p_avs})
    q_canon = p_ave["backbone"]["layers"][0]["blocks"][0]["attn"]["qkv"]["kernel"]
    q_avs = shared["avs"]["backbone"]["layers"][0]["blocks"][0]["attn"]["qkv"]["kernel"]
    assert q_avs is q_canon  # same buffer — zero extra HBM
    # adapters stay task-specific
    a_canon = p_ave["backbone"]["layers"][0]["blocks"][0]["S_Adapter"]["D_fc1"]["kernel"]
    a_avs = shared["avs"]["backbone"]["layers"][0]["blocks"][0]["S_Adapter"]["D_fc1"]["kernel"]
    assert a_avs is not a_canon


def test_server_dispatch():
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    p_ave = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    srv = MultiTaskServer(dtype=jnp.float32)
    srv.add_ave("ave29", cfg, p_ave)
    B = 1
    batch = {"a": np.random.randn(B, 2, cfg.img_size, cfg.img_size).astype(np.float32),
             "v": np.random.randn(B, 2, cfg.img_size, cfg.img_size, 3).astype(np.float32)}
    out = srv.predict("ave29", batch)
    assert out.shape == (B * 2, cfg.label_dim)
    assert srv.tasks() == ["ave29"]


def test_serve_stream_end_to_end(tmp_path):
    """Streaming decode path: wav fixtures -> HostDecoder -> device pipeline
    -> model, with order-preserving micro-batching + tail padding."""
    import os
    from stgcma_tpu.data.loader import make_ave_device_pipeline
    from stgcma_tpu.ops.fbank import FbankConfig
    from stgcma_tpu.serving import HostDecoder, StreamRequest, serve_stream

    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    srv = MultiTaskServer(dtype=jnp.float32)
    srv.add_ave("ave29", cfg, ave.init_swin_ave(jax.random.PRNGKey(0), cfg))

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "ave",
                        "raw_audio")
    wavs = [os.path.join(fdir, f) for f in sorted(os.listdir(fdir))]
    rng = np.random.RandomState(0)
    reqs = [StreamRequest(task="ave29", wav_path=wavs[i % len(wavs)],
                          frames=rng.randint(0, 255, (2, 64, 64, 3),
                                             dtype=np.uint8), rid=i)
            for i in range(5)]

    fb = FbankConfig(num_mel_bins=cfg.img_size)
    pipe = make_ave_device_pipeline(fbank_cfg=fb, target_length=cfg.img_size,
                                    image_size=cfg.img_size)

    def ave_pipeline(host):
        a, v = pipe({"frames": host["frames"], "wave": host["wave"]})
        return {"a": a, "v": v}

    dec = HostDecoder(num_segments=2, seg_samples=16000)
    outs = list(serve_stream(srv, {"ave29": ave_pipeline}, reqs,
                             batch_size=2, decoder=dec))
    got = {}
    for rids, logits in outs:
        assert logits.shape[0] == len(rids) * cfg.num_frames
        for j, rid in enumerate(rids):
            got[rid] = logits[j * cfg.num_frames:(j + 1) * cfg.num_frames]
    assert sorted(got) == list(range(5))
    for rid in got:
        assert np.isfinite(got[rid]).all()


def test_host_decoder_rejects_heterogeneous_extras():
    """A mixed micro-batch (some requests with extras, some without, or with
    different extra keys) must fail loudly at decode time, not with a distant
    KeyError in the task pipeline (ADVICE r2)."""
    import os
    import pytest
    from stgcma_tpu.serving import HostDecoder, StreamRequest

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "ave",
                        "raw_audio")
    wav = os.path.join(fdir, sorted(os.listdir(fdir))[0])
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    dec = HostDecoder(num_segments=2, seg_samples=16000)
    q = np.zeros((14,), np.int32)

    # some-with, some-without
    reqs = [StreamRequest(task="avqa", wav_path=wav, frames=frames, rid=0,
                          extras={"question": q}),
            StreamRequest(task="avqa", wav_path=wav, frames=frames, rid=1)]
    with pytest.raises(ValueError, match="heterogeneous extras"):
        dec(reqs)

    # different keys
    reqs = [StreamRequest(task="avqa", wav_path=wav, frames=frames, rid=0,
                          extras={"question": q}),
            StreamRequest(task="avqa", wav_path=wav, frames=frames, rid=1,
                          extras={"other": q})]
    with pytest.raises(ValueError, match="heterogeneous extras"):
        dec(reqs)

    # homogeneous extras pass
    reqs = [StreamRequest(task="avqa", wav_path=wav, frames=frames, rid=i,
                          extras={"question": q}) for i in range(2)]
    batch = dec(reqs)
    assert batch["question"].shape == (2, 14)


def test_serve_stream_from_frame_paths():
    """Full raw-bytes-to-logits ingest: requests carry jpg PATHS (+ wav
    paths); HostDecoder's native image decoder stages them at frame_hw and
    the device pipeline/model run from there. Mixed micro-batches
    (pre-decoded frames + frame_paths) stack as long as the pre-decoded
    frames match the staging geometry."""
    import os
    from stgcma_tpu.data.loader import make_ave_device_pipeline
    from stgcma_tpu.ops.fbank import FbankConfig
    from stgcma_tpu.serving import HostDecoder, StreamRequest, serve_stream

    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    srv = MultiTaskServer(dtype=jnp.float32)
    srv.add_ave("ave29", cfg, ave.init_swin_ave(jax.random.PRNGKey(0), cfg))

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "ave")
    wav = os.path.join(fdir, "raw_audio",
                       sorted(os.listdir(os.path.join(fdir, "raw_audio")))[0])
    jdir = os.path.join(fdir, "video_frames", "fx_e5f6")
    jpgs = [os.path.join(jdir, f) for f in sorted(os.listdir(jdir))[:2]]

    rng = np.random.RandomState(0)
    reqs = [
        StreamRequest(task="ave29", wav_path=wav, frame_paths=jpgs, rid=0),
        StreamRequest(task="ave29", wav_path=wav, rid=1,
                      frames=rng.randint(0, 255, (2, 64, 64, 3),
                                         dtype=np.uint8)),
        StreamRequest(task="ave29", wav_path=wav, frame_paths=jpgs, rid=2),
    ]

    fb = FbankConfig(num_mel_bins=cfg.img_size)
    pipe = make_ave_device_pipeline(fbank_cfg=fb, target_length=cfg.img_size,
                                    image_size=cfg.img_size)

    def ave_pipeline(host):
        a, v = pipe({"frames": host["frames"], "wave": host["wave"]})
        return {"a": a, "v": v}

    dec = HostDecoder(num_segments=2, seg_samples=16000, frame_hw=(64, 64))
    outs = list(serve_stream(srv, {"ave29": ave_pipeline}, reqs,
                             batch_size=2, decoder=dec))
    got = {}
    for rids, logits in outs:
        for j, rid in enumerate(rids):
            got[rid] = logits[j * cfg.num_frames:(j + 1) * cfg.num_frames]
    assert sorted(got) == [0, 1, 2]
    for rid in got:
        assert np.isfinite(got[rid]).all()
    # rid 0 and rid 2 decoded the same files -> identical logits
    np.testing.assert_allclose(got[0], got[2], rtol=0, atol=1e-5)


def test_stream_request_requires_frames_or_paths():
    from stgcma_tpu.serving import HostDecoder, StreamRequest
    import pytest as _pytest
    dec = HostDecoder(num_segments=2, seg_samples=16000, frame_hw=(16, 16))
    req = StreamRequest(task="ave29", wav_path="/nonexistent.wav", rid=7)
    with _pytest.raises(ValueError, match="rid=7"):
        dec([req])


def test_serve_stream_from_video_container(tmp_path):
    import pytest
    """Raw VIDEO-FILE ingest (round 5): mp4 -> cv2/FFMPEG host decode at the
    offline sampling grid -> device preprocess -> model. The reference can
    only serve from pre-extracted frame dirs; this is the full corpus-file
    -> logits chain."""
    import os
    cv2 = pytest.importorskip("cv2")
    from stgcma_tpu.data.loader import make_ave_device_pipeline
    from stgcma_tpu.ops.fbank import FbankConfig
    from stgcma_tpu.serving import HostDecoder, serve_stream, video_requests

    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    srv = MultiTaskServer(dtype=jnp.float32)
    srv.add_ave("ave29", cfg, ave.init_swin_ave(jax.random.PRNGKey(0), cfg))

    vids = []
    rng = np.random.RandomState(0)
    for k in range(3):
        p = str(tmp_path / f"clip{k}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 4.0, (64, 64))
        assert w.isOpened()
        for i in range(12):
            w.write(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8))
        w.release()
        vids.append(p)

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "ave",
                        "raw_audio")
    wavs = [os.path.join(fdir, f) for f in sorted(os.listdir(fdir))]
    reqs = list(video_requests(
        "ave29", [(vids[i], wavs[i % len(wavs)]) for i in range(3)],
        num_frames=cfg.num_frames, frame_hw=(64, 64)))
    assert len(reqs) == 3 and reqs[0].frames.shape == (2, 64, 64, 3)

    fb = FbankConfig(num_mel_bins=cfg.img_size)
    pipe = make_ave_device_pipeline(fbank_cfg=fb, target_length=cfg.img_size,
                                    image_size=cfg.img_size)

    def ave_pipeline(host):
        a, v = pipe({"frames": host["frames"], "wave": host["wave"]})
        return {"a": a, "v": v}

    dec = HostDecoder(num_segments=2, seg_samples=16000)
    outs = list(serve_stream(srv, {"ave29": ave_pipeline}, reqs,
                             batch_size=2, decoder=dec))
    got = {rid for rids, _ in outs for rid in rids}
    assert got == {0, 1, 2}
    for _, logits in outs:
        assert np.isfinite(logits).all()
