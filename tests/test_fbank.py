"""fbank frontend: independent numpy oracle + shape/property checks.

torchaudio is not installed in this image, so bit-parity is checked against a
straight-line numpy re-derivation of the kaldi pipeline written independently
of the JAX implementation (two-implementation cross-check), plus structural
properties (frame counts, mel monotonicity, padding behavior).
"""
import numpy as np
import jax.numpy as jnp

from stgcma_tpu.ops.fbank import (CLIP_FBANK, SWIN_FBANK, FbankConfig, fbank,
                                  fbank_image, segment_starts)


def numpy_kaldi_fbank(wave: np.ndarray, num_mel_bins: int, frame_shift_ms: float):
    """Oracle: kaldi fbank with hanning window, dither=0, use_energy=False."""
    sf = 16000.0
    shift = int(sf * frame_shift_ms * 0.001)
    ws = int(sf * 25.0 * 0.001)
    padded = 512
    m = 1 + (len(wave) - ws) // shift
    frames = np.stack([wave[i * shift: i * shift + ws] for i in range(m)]).astype(np.float64)
    frames = frames - frames.mean(axis=1, keepdims=True)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * pre
    n = np.arange(ws)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * n / (ws - 1))
    frames = frames * window
    frames = np.pad(frames, ((0, 0), (0, padded - ws)))
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    nyq = sf / 2
    mel_lo, mel_hi = mel(20.0), mel(nyq)
    delta = (mel_hi - mel_lo) / (num_mel_bins + 1)
    fft_bin_width = sf / padded
    mel_f = mel(fft_bin_width * np.arange(padded // 2))
    banks = np.zeros((num_mel_bins, padded // 2 + 1))
    for b in range(num_mel_bins):
        left = mel_lo + b * delta
        center, right = left + delta, left + 2 * delta
        up = (mel_f - left) / (center - left)
        down = (right - mel_f) / (right - center)
        banks[b, : padded // 2] = np.maximum(0, np.minimum(up, down))
    mels = spec @ banks.T
    return np.log(np.maximum(mels, 1.1920928955078125e-07))


def test_fbank_matches_numpy_oracle_swin():
    rng = np.random.RandomState(0)
    wave = (rng.randn(16000) * 0.1).astype(np.float32)
    ours = np.asarray(fbank(jnp.asarray(wave), SWIN_FBANK))
    oracle = numpy_kaldi_fbank(wave.astype(np.float64), 224, 4.4)
    assert ours.shape == oracle.shape == (223, 224)
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


def test_fbank_matches_numpy_oracle_clip():
    rng = np.random.RandomState(1)
    wave = (rng.randn(16320) * 0.1).astype(np.float32)  # ~1.02 s
    ours = np.asarray(fbank(jnp.asarray(wave), CLIP_FBANK))
    oracle = numpy_kaldi_fbank(wave.astype(np.float64), 128, 10.0)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


def test_fbank_batched_consistency():
    rng = np.random.RandomState(2)
    waves = (rng.randn(3, 4, 16000) * 0.1).astype(np.float32)
    batched = np.asarray(fbank(jnp.asarray(waves), SWIN_FBANK))
    single = np.asarray(fbank(jnp.asarray(waves[1, 2]), SWIN_FBANK))
    np.testing.assert_allclose(batched[1, 2], single, rtol=1e-6, atol=1e-6)


def test_fbank_image_pad_and_norm():
    rng = np.random.RandomState(3)
    wave = (rng.randn(16000) * 0.1).astype(np.float32)
    img = np.asarray(fbank_image(jnp.asarray(wave), SWIN_FBANK, 224, -4.0, 4.0))
    assert img.shape == (224, 224)
    # last row is zero padding (223 frames -> pad 1)
    np.testing.assert_allclose(img[-1], (0 - (-4.0)) / 8.0 * 0, atol=1e-6)
    assert np.abs(img[-1]).max() == 0.0
    raw = np.asarray(fbank(jnp.asarray(wave), SWIN_FBANK))
    np.testing.assert_allclose(img[:223], (raw - (-4.0)) / 8.0, rtol=1e-6)


def test_segment_starts_matches_reference_linspace():
    # reference: np.linspace(0, L - 16000*(1+0.1), num=10) for 10x1s AVE segments
    L = 160700
    ours = segment_starts(L, 16000, 10)
    ref = np.linspace(0, L - 16000 * 1.1, num=10, dtype=int)
    np.testing.assert_array_equal(ours, ref)


def test_fbank_matches_frozen_golden():
    """Regression pin: committed golden arrays (tests/fixtures/*.npy) freeze the
    kaldi math on disk, so a change that shifts BOTH the jax implementation and
    the in-test oracle (shared-assumption drift) still fails."""
    import os
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    wave = np.load(os.path.join(fix, "fbank_golden_wave.npy"))
    g_swin = np.load(os.path.join(fix, "fbank_golden_swin_224_4p4.npy"))
    g_clip = np.load(os.path.join(fix, "fbank_golden_clip_128_10.npy"))
    ours_swin = np.asarray(fbank(jnp.asarray(wave), SWIN_FBANK))
    ours_clip = np.asarray(fbank(jnp.asarray(wave), CLIP_FBANK))
    np.testing.assert_allclose(ours_swin, g_swin, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours_clip, g_clip, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# second oracle: torch-fp32 transcription of torchaudio.compliance.kaldi.fbank
# (same dtype and op set as upstream: as_strided framing, replicate-pad
# preemphasis, hann_window(periodic=False), fp32 rfft, eps-floored log).
# torchaudio itself is not installed; docs/fbank_parity.md records the
# step-by-step audit of these semantics against the upstream implementation.
# ---------------------------------------------------------------------------

def torch_kaldi_fbank(wave, num_mel_bins, frame_shift_ms):
    import torch
    sf = 16000.0
    shift = int(sf * frame_shift_ms * 0.001)
    ws = int(sf * 25.0 * 0.001)
    padded = 512
    w = torch.from_numpy(np.asarray(wave, np.float32))
    m = 1 + (w.numel() - ws) // shift
    frames = w.as_strided((m, ws), (shift, 1)).clone()
    frames = frames - frames.mean(dim=1, keepdim=True)
    prev = torch.nn.functional.pad(frames.unsqueeze(0), (1, 0),
                                   mode="replicate").squeeze(0)[:, :-1]
    frames = frames - 0.97 * prev
    frames = frames * torch.hann_window(ws, periodic=False)
    frames = torch.nn.functional.pad(frames, (0, padded - ws))
    power = torch.fft.rfft(frames).abs().pow(2.0)

    def mel(f):
        return 1127.0 * torch.log(1.0 + f / 700.0)

    mel_lo = mel(torch.tensor(20.0))
    mel_hi = mel(torch.tensor(sf / 2))
    delta = (mel_hi - mel_lo) / (num_mel_bins + 1)
    left = mel_lo + torch.arange(num_mel_bins).unsqueeze(1) * delta
    center, right = left + delta, left + 2 * delta
    mel_f = mel(sf / padded * torch.arange(padded // 2)).unsqueeze(0)
    up = (mel_f - left) / (center - left)
    down = (right - mel_f) / (right - center)
    banks = torch.clamp(torch.min(up, down), min=0.0)
    banks = torch.nn.functional.pad(banks, (0, 1), value=0.0)  # nyquist col
    mels = power @ banks.T
    eps = torch.finfo(torch.float32).eps
    return mels.clamp(min=eps).log().numpy()


def test_fbank_matches_torch_fp32_oracle_swin():
    rng = np.random.RandomState(3)
    wave = (rng.randn(16000) * 0.1).astype(np.float32)
    ours = np.asarray(fbank(jnp.asarray(wave), SWIN_FBANK))
    oracle = torch_kaldi_fbank(wave, 224, 4.4)
    assert ours.shape == oracle.shape == (223, 224)
    np.testing.assert_allclose(ours, oracle, rtol=3e-3, atol=3e-3)


def test_fbank_matches_torch_fp32_oracle_clip():
    rng = np.random.RandomState(4)
    wave = (rng.randn(16000) * 0.1).astype(np.float32)
    ours = np.asarray(fbank(jnp.asarray(wave), CLIP_FBANK))
    oracle = torch_kaldi_fbank(wave, 128, 10.0)
    assert ours.shape == oracle.shape == (98, 128)
    np.testing.assert_allclose(ours, oracle, rtol=3e-3, atol=3e-3)


def test_fractional_shift_truncation():
    """The 4.4 ms shift truncates to int(70.4) = 70 samples (kaldi
    window_shift int cast) — 1 s of 16 kHz audio yields exactly
    1 + (16000-400)//70 = 223 frames, zero-padded to the 224-row image."""
    assert SWIN_FBANK.window_shift == 70
    assert SWIN_FBANK.num_frames(16000) == 223
    img = fbank_image(jnp.zeros((1, 16000)), SWIN_FBANK, 224, 0.0, 1.0)
    assert img.shape == (1, 224, 224)
