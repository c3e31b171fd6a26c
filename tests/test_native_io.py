"""Native host-IO library: WAV decode parity vs scipy + segmentation grid."""
import os
import subprocess

import numpy as np
import pytest

from stgcma_tpu.data import native_io

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="libstgcma_host.so not built")


def _write_wav(path, data, sr=16000):
    from scipy.io import wavfile
    wavfile.write(path, sr, (data * 32767).astype(np.int16))


def test_decode_matches_scipy(tmp_path):
    rng = np.random.RandomState(0)
    wave = (rng.randn(32000) * 0.1).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    _write_wav(p, wave)
    out = native_io.decode_wav(p)
    assert out is not None
    decoded, sr = out
    assert sr == 16000
    q = (wave * 32767).astype(np.int16).astype(np.float32) / 32768.0
    np.testing.assert_allclose(decoded, q, atol=1e-6)


def test_batch_segmentation(tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(3):
        wave = (rng.randn(170000) * 0.1).clip(-1, 1).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        _write_wav(p, wave)
        paths.append(p)
    paths.append(str(tmp_path / "missing.wav"))
    waves, ok = native_io.decode_wav_batch(paths, num_segments=10,
                                           seg_samples=16000)
    assert waves.shape == (4, 10, 16000)
    assert ok.tolist() == [True, True, True, False]
    assert np.abs(waves[3]).max() == 0.0

    # reference grid: starts = linspace(0, L - 16000*1.1, 10); mean-subtracted
    from scipy.io import wavfile
    sr, raw = wavfile.read(paths[0])
    w = raw.astype(np.float32) / 32768.0
    w = w - w.mean()
    starts = np.linspace(0, len(w) - (16000 + 1600), 10).astype(np.int64)
    for s_i, st in enumerate(starts):
        np.testing.assert_allclose(waves[0, s_i], w[st:st + 16000], atol=2e-6)


# ---------------------------------------------------------------------------
# image decode (JPEG/PNG) — VERDICT r3 #4: engineered host ingest stage
# ---------------------------------------------------------------------------

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

imagemark = pytest.mark.skipif(not native_io.image_available(),
                               reason="image decode not in libstgcma_host.so")


@imagemark
def test_decode_image_matches_pil_jpg_and_png():
    """Native decode must be bit-exact vs PIL at native size (both stacks sit
    on libjpeg-turbo / libpng; the reference decodes via PIL,
    AVE/dataloader.py:304-344)."""
    from PIL import Image
    jpg = os.path.join(FIX, "ave", "video_frames", "fx_e5f6", "0004.jpg")
    png = os.path.join(FIX, "avs_ms3", "gt_masks", "test", "fxm_trio",
                       "fxm_trio_2.png")
    for p in (jpg, png):
        ref = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        got = native_io.decode_image(p)
        assert got is not None and got.shape == ref.shape
        np.testing.assert_array_equal(got, ref, err_msg=p)


@imagemark
def test_decode_image_batch_shapes_and_fallbacks(tmp_path):
    from PIL import Image
    jpg = os.path.join(FIX, "ave", "video_frames", "fx_e5f6", "0004.jpg")
    ref = np.asarray(Image.open(jpg).convert("RGB"), np.uint8)
    H, W = ref.shape[:2]
    paths = [jpg, jpg, str(tmp_path / "missing.jpg")]
    frames, ok = native_io.decode_image_batch(paths, H, W)
    assert frames.shape == (3, H, W, 3)
    assert ok.tolist() == [True, True, False]
    np.testing.assert_array_equal(frames[0], ref)
    assert frames[2].max() == 0

    # resize path: ask for a different geometry — must still succeed and be
    # close to PIL's bilinear resize
    th, tw = H // 2, W // 2
    small, ok = native_io.decode_image_batch([jpg], th, tw)
    assert ok[0] and small.shape == (1, th, tw, 3)
    pil_small = np.asarray(
        Image.open(jpg).convert("RGB").resize((tw, th), Image.BILINEAR),
        np.float32)
    # same antialiased triangle filter as PIL; only fixed-point-vs-float
    # rounding differs (+-1 lsb)
    err = np.abs(small[0].astype(np.float32) - pil_small)
    assert err.max() <= 1.0, f"resize deviation max {err.max()}"


@imagemark
def test_corrupt_image_flags_not_crashes(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8garbage-not-a-jpeg")
    frames, ok = native_io.decode_image_batch([str(bad)], 32, 32)
    assert not ok[0] and frames.max() == 0
