"""Dataset classes against committed fixtures in the EXACT reference corpus
schemas (tests/fixtures/gen_fixtures.py regenerates them).

Covers: AVE order-h5 + Annotations.txt indirection + frame/wav decode, AVQA
vocab build + question encoding + negative sampling, AVS csv split + masks,
and a full batch through the TPU-resident device pipeline."""
import os

import numpy as np
import pytest

import jax

from stgcma_tpu.data.datasets import AVEDataset, AVQADataset, AVSDataset
from stgcma_tpu.data.loader import DataLoader, make_ave_device_pipeline

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(FIX, "ave")),
                                reason="fixtures not generated")


def test_ave_real_schema_end_to_end():
    root = os.path.join(FIX, "ave")
    tr = AVEDataset(os.path.join(root, "train_order.h5"),
                    os.path.join(root, "labels.h5"),
                    os.path.join(root, "video_frames"),
                    os.path.join(root, "raw_audio"), num_frames=10,
                    mode="train",
                    annotations_txt=os.path.join(root, "Annotations.txt"))
    te = AVEDataset(os.path.join(root, "test_order.h5"),
                    os.path.join(root, "labels.h5"),
                    os.path.join(root, "video_frames"),
                    os.path.join(root, "raw_audio"), num_frames=10, mode="eval",
                    annotations_txt=os.path.join(root, "Annotations.txt"))
    assert len(tr) == 2 and len(te) == 1
    it = tr[0]
    assert it["frames"].shape == (10, 32, 32, 3) and it["frames"].dtype == np.uint8
    assert it["wave"].shape == (10, 2000)  # sr*1.0s segments
    assert it["labels"].shape == (10, 29) and it["labels"].sum() == 10
    # decoded real pixels, not the corrupted-sample fallback
    assert it["frames"].std() > 1
    assert abs(float(it["wave"].mean())) < 1e-3  # centered waveform

    loader = DataLoader(tr, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    pipe = make_ave_device_pipeline(train=True, image_size=32, mixup=0.5)
    a, v = pipe(batch, jax.random.PRNGKey(0))
    assert v.shape == (2, 10, 32, 32, 3)
    assert a.shape[0] == 2 and a.shape[1] == 10
    assert np.isfinite(np.asarray(a, np.float32)).all()
    assert np.isfinite(np.asarray(v, np.float32)).all()


def test_avqa_real_schema():
    root = os.path.join(FIX, "avqa")
    ds = AVQADataset(os.path.join(root, "avqa-train.json"),
                     os.path.join(root, "avqa-train.json"),
                     os.path.join(root, "frames"),
                     os.path.join(root, "audio_wav"), num_frames=10,
                     mode="train")
    assert len(ds) == 4
    # vocab from templ substitution: '<Object>' replaced by 'dog'/'cat'
    assert "dog" in ds.word2idx and "cat" in ds.word2idx
    assert "<Object>" not in ds.word2idx
    assert set(ds.ans2idx) == {"two", "yes"}
    it = ds[0]
    assert it["frames"].shape == (10, 32, 32, 3)
    assert it["frames_nega"].shape == (10, 32, 32, 3)
    # negative frames come from a DIFFERENT video
    assert not np.array_equal(it["frames"], it["frames_nega"])
    assert it["wave"].shape == (10, int(2000 * 1.95))
    assert it["question"].shape == (14,)
    assert it["question"][-1] == ds.word2idx["<pad>"]
    assert 0 <= int(it["answer"]) < 42


def test_avs_real_schema():
    root = os.path.join(FIX, "avs")
    tr = AVSDataset(os.path.join(root, "s4_meta_data.csv"), root, split="train")
    te = AVSDataset(os.path.join(root, "s4_meta_data.csv"), root, split="test")
    assert len(tr) == 2 and len(te) == 1
    it = tr[0]
    assert it["frames"].shape == (5, 32, 32, 3)
    assert it["masks"].shape == (1, 224, 224)       # train: 1 mask
    assert set(np.unique(it["masks"])) <= {0.0, 1.0}
    assert it["wave"].shape == (5, int(2000 * 1.95))
    ite = te[0]
    assert ite["masks"].shape == (5, 224, 224)      # test: 5 masks
    # no audio_log_mel dir in the fixture tree -> the optional key is absent
    assert "audio_log_mel" not in it


def test_avs_audio_log_mel_pkl(tmp_path):
    """Reference S4Dataset returns the VGGish log-mel pkl with every item
    (AVS/dataloader.py:162-190, [5,1,96,64]); AVSDataset loads it when the
    dir_audio_log_mel tree has one for the video."""
    import pickle
    import shutil
    root = os.path.join(FIX, "avs")
    ds0 = AVSDataset(os.path.join(root, "s4_meta_data.csv"), root,
                     split="train")
    name, cat = ds0.rows[0]["name"], ds0.rows[0]["category"]
    lm_dir = tmp_path / "audio_log_mel" / "train" / cat
    lm_dir.mkdir(parents=True)
    lm = np.random.RandomState(0).randn(5, 1, 96, 64).astype(np.float32)
    with open(lm_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(lm, f)
    ds = AVSDataset(os.path.join(root, "s4_meta_data.csv"), root,
                    split="train", dir_audio_log_mel=str(tmp_path / "audio_log_mel"))
    it = ds[0]
    assert it["audio_log_mel"].shape == (5, 1, 96, 64)
    np.testing.assert_allclose(it["audio_log_mel"], lm)
    # presence is decided ONCE at construction (ADVICE r3): a partially
    # populated tree raises on the missing item instead of producing a
    # mixed-schema batch (item 2 has no pkl)
    with pytest.raises(FileNotFoundError):
        ds[1]
    # explicit opt-out keeps the key absent even when the tree exists
    ds_off = AVSDataset(os.path.join(root, "s4_meta_data.csv"), root,
                        split="train",
                        dir_audio_log_mel=str(tmp_path / "audio_log_mel"),
                        load_audio_log_mel=False)
    assert "audio_log_mel" not in ds_off[0]


def test_avs_ms3_schema():
    """MS3 meta (AVS/preprocess/preprocess_ms3.py): no category column; the
    dataset path layout collapses the category level."""
    root = os.path.join(FIX, "avs_ms3")
    tr = AVSDataset(os.path.join(root, "ms3_meta_data.csv"), root,
                    split="train")
    te = AVSDataset(os.path.join(root, "ms3_meta_data.csv"), root,
                    split="test")
    assert len(tr) == 2 and len(te) == 1
    it = tr[0]
    assert it["frames"].shape == (5, 32, 32, 3)
    assert it["masks"].shape == (1, 224, 224)
    assert it["wave"].shape == (5, int(2000 * 1.95))
    assert te[0]["masks"].shape == (5, 224, 224)


def test_extract_audio_tool(tmp_path):
    """AVQA extract_audio surface (AVQA/preprocessing/extract_audio.py:10-36):
    iterate videos, skip existing wavs, survive undecodable files."""
    from stgcma_tpu.tools import extract_audio as EA
    vdir = tmp_path / "videos"
    adir = tmp_path / "wav"
    vdir.mkdir()
    adir.mkdir()
    for n in ("clip1.mp4", "clip2.mp4", "broken.mp4"):
        (vdir / n).write_bytes(b"\x00" * 16)
    (adir / "clip1.wav").write_bytes(b"RIFF")  # pre-existing -> skipped

    calls = []

    def fake_extract(video, out, sr):
        if "broken" in video:
            raise RuntimeError("undecodable")
        calls.append((os.path.basename(video), os.path.basename(out), sr))
        open(out, "wb").write(b"RIFF")

    done, skipped, failed = EA.main(
        ["--video_pth", str(vdir), "--save_pth", str(adir)],
        extractor=fake_extract)
    assert (done, skipped, failed) == (1, 1, 1)
    assert calls == [("clip2.mp4", "clip2.wav", 16000)]
    assert (adir / "clip2.wav").exists()


def test_avs_dir_overrides(tmp_path):
    """--dir_image/--dir_mask/--dir_audio_wav must actually take effect
    (they were silent no-ops once: __getitem__ kept building paths from
    data_root — reference flags AVS/run_adapt_avs.py:89-92)."""
    import shutil
    root = os.path.join(FIX, "avs")
    # split each media kind into its own unrelated root
    for kind in ("visual_frames", "gt_masks", "audio_wav"):
        shutil.copytree(os.path.join(root, kind),
                        os.path.join(tmp_path, "alt_" + kind))
    ds = AVSDataset(os.path.join(root, "s4_meta_data.csv"),
                    data_root="/nonexistent", split="train",
                    dir_image=str(tmp_path / "alt_visual_frames"),
                    dir_mask=str(tmp_path / "alt_gt_masks"),
                    dir_audio_wav=str(tmp_path / "alt_audio_wav"))
    it = ds[0]
    assert it["frames"].shape == (5, 32, 32, 3)
    assert it["masks"].shape == (1, 224, 224)
