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
