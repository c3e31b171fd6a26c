"""AVS offline preprocessing: video -> per-second frames (224x224 PNG),
wav extraction, and VGGish log-mel pickles.

Replaces AVS/preprocess/{preprocess_s4.py, preprocess_ms3.py} (ffmpeg/imageio
frame sampling at 16 fps -> 1 png/s, moviepy 16 kHz wav extraction,
torchvggish log-mel 5x[96,64] with last-second repeat padding).

Video decode prefers OpenCV's FFMPEG backend (mp4/avi/mkv/webm — the
reference's container formats, preprocess_s4.py:24-43) and falls back to
imageio (GIF and other Pillow-native containers); audio decode uses the
native host-IO library or scipy. The log-mel uses ops.fbank.vggish_log_mel.
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import List, Optional

import numpy as np


def _decode_video_cv2(video_path: str):
    """(frames (T,H,W,3) RGB uint8, fps) via OpenCV/FFMPEG, or None if the
    backend can't open the container."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        return None
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        return None
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f[:, :, ::-1])        # BGR -> RGB
    cap.release()
    if not frames:
        return None
    return np.stack(frames), float(fps) if fps and fps > 0 else 16.0


def extract_frames(video_path: str, out_dir: str, name: str,
                   num_seconds: int = 5, size: int = 224) -> bool:
    """1 frame per second, resized to size^2, saved {name}_{i+1}.png
    (preprocess_s4.py:24-102 sampling grid)."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        print("PIL unavailable — cannot extract frames")
        return False
    decoded = None
    if not video_path.lower().endswith(".gif"):   # cv2 mishandles GIF alpha
        decoded = _decode_video_cv2(video_path)
    if decoded is not None:
        frames, fps = decoded
    else:
        try:
            import imageio.v3 as iio
            meta = iio.immeta(video_path)
            if "fps" in meta:
                fps = float(meta["fps"])
            elif meta.get("duration"):  # ms per frame (GIF-style containers)
                fps = 1000.0 / float(meta["duration"])
            else:
                fps = 16.0
            frames = iio.imread(video_path)  # (T, H, W, C)
        except Exception as e:  # pragma: no cover
            print(f"decode failed for {video_path}: {e}")
            return False
    os.makedirs(out_dir, exist_ok=True)
    total = len(frames)
    for s in range(num_seconds):
        idx = min(int(round((s + 0.5) * fps)), total - 1)
        img = Image.fromarray(frames[idx]).convert("RGB").resize(
            (size, size), Image.BILINEAR)
        img.save(os.path.join(out_dir, f"{name}_{s+1}.png"))
    return True


def wav_to_vggish_pickle(wav_path: str, out_pkl: str, num_seconds: int = 5,
                         sample_rate: int = 16000):
    """5 x (96, 64) VGGish log-mel examples, repeating the last second when the
    clip is short (preprocess_s4.py:133-142)."""
    import jax.numpy as jnp
    from ..data.datasets import load_wav
    from ..ops.fbank import vggish_log_mel

    wav, sr = load_wav(wav_path)
    wav = wav.mean(axis=0)
    if sr != sample_rate:
        # linear resample (offline tool; ffmpeg-grade resampling not required)
        n_out = int(len(wav) * sample_rate / sr)
        x_old = np.linspace(0, 1, len(wav))
        wav = np.interp(np.linspace(0, 1, n_out), x_old, wav).astype(np.float32)
    seg = int(0.96 * sample_rate)
    examples = []
    for s in range(num_seconds):
        start = s * sample_rate
        chunk = wav[start:start + seg]
        if len(chunk) < seg:
            # repeat the last full second
            if examples:
                examples.append(examples[-1])
                continue
            chunk = np.pad(chunk, (0, seg - len(chunk)))
        examples.append(np.asarray(vggish_log_mel(jnp.asarray(chunk)),
                                   np.float32))
    arr = np.stack(examples)[:, None]  # (5, 1, 96, 64) like torchvggish input
    os.makedirs(os.path.dirname(out_pkl) or ".", exist_ok=True)
    with open(out_pkl, "wb") as f:
        pickle.dump(arr, f)
    return arr


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--videos_dir", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--num_seconds", type=int, default=5)
    args = p.parse_args(argv)
    vids = [f for f in os.listdir(args.videos_dir)
            if f.endswith((".mp4", ".avi", ".mkv", ".webm", ".gif"))]
    for f in vids:
        name = os.path.splitext(f)[0]
        extract_frames(os.path.join(args.videos_dir, f),
                       os.path.join(args.out_root, "visual_frames", args.split,
                                    name),
                       name, args.num_seconds)
    print(f"processed {len(vids)} videos")


if __name__ == "__main__":
    main()
