"""VGGish log-mel frontend + AVS preprocess pickle tool."""
import numpy as np
import jax.numpy as jnp

from stgcma_tpu.ops.fbank import vggish_log_mel, _vggish_mel_matrix


def test_vggish_shapes_and_mel_matrix():
    wave = (np.random.RandomState(0).randn(15360) * 0.1).astype(np.float32)
    out = np.asarray(vggish_log_mel(jnp.asarray(wave)))
    assert out.shape == (94, 64)  # 0.96s -> 1+(15360-400)//160 = 94 frames
    assert np.isfinite(out).all()
    M = _vggish_mel_matrix()
    assert M.shape == (257, 64)
    # triangular bands: each column sums to something positive, DC excluded
    assert (M.sum(0) > 0).all()
    assert M[0].sum() == 0.0
    # band centers increase monotonically
    centers = M.argmax(0)
    assert (np.diff(centers) >= 0).all()


def test_wav_to_vggish_pickle(tmp_path):
    from scipy.io import wavfile
    from stgcma_tpu.tools.preprocess_avs import wav_to_vggish_pickle
    rng = np.random.RandomState(1)
    wave = (rng.randn(16000 * 3) * 0.1).clip(-1, 1)  # 3s (short -> repeat pad)
    p = str(tmp_path / "a.wav")
    wavfile.write(p, 16000, (wave * 32767).astype(np.int16))
    arr = wav_to_vggish_pickle(p, str(tmp_path / "a.pkl"), num_seconds=5)
    assert arr.shape == (5, 1, 94, 64)
    # seconds 4 and 5 repeat second 3
    np.testing.assert_array_equal(arr[3], arr[2])
    np.testing.assert_array_equal(arr[4], arr[3])
