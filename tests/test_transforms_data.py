"""Vision transform kernels + loader pipeline: shapes, determinism, statistics,
and torch parity where deterministic."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from stgcma_tpu.data import transforms as T
from stgcma_tpu.data.datasets import SyntheticAVE
from stgcma_tpu.data.loader import DataLoader, collate, make_ave_device_pipeline


def test_eval_transform_matches_torch_resize_crop():
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 256, (3, 360, 480, 3), np.uint8)
    out = np.asarray(T.eval_transform(jnp.asarray(clip), 224))
    # torch oracle: bilinear resize short side to 224 (no antialias), center crop
    x = torch.from_numpy(clip).permute(0, 3, 1, 2).float()
    nh, nw = 224, int(round(480 * 224 / 360))
    xr = tF.interpolate(x, size=(nh, nw), mode="bilinear", align_corners=False)
    top, left = 0, (nw - 224) // 2
    xc = xr[:, :, top:top + 224, left:left + 224] / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    ref = ((xc - mean) / std).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_rand_augment_shapes_and_range():
    rng = np.random.RandomState(1)
    clip = jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3)).astype(np.float32))
    out = T.rand_augment(jax.random.PRNGKey(0), clip)
    assert out.shape == clip.shape
    o = np.asarray(out)
    assert o.min() >= -1e-3 and o.max() <= 255.001
    # deterministic under the same key
    out2 = T.rand_augment(jax.random.PRNGKey(0), clip)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different under a different key (almost surely)
    out3 = T.rand_augment(jax.random.PRNGKey(7), clip)
    assert np.abs(np.asarray(out3) - o).max() > 0


def test_individual_ops_match_pil_semantics():
    rng = np.random.RandomState(2)
    img_np = rng.randint(0, 256, (32, 32, 3)).astype(np.float32)
    img = jnp.asarray(img_np)
    # invert
    np.testing.assert_allclose(np.asarray(T.op_invert(img, 0.0)), 255 - img_np)
    # posterize m=10 -> 0 bits -> all zero
    assert np.asarray(T.op_posterize(img, jnp.float32(10.0))).max() == 0
    # solarize m=0 -> threshold 256 -> identity
    np.testing.assert_allclose(np.asarray(T.op_solarize(img, jnp.float32(0.0))), img_np)
    # brightness factor 1 (m=0) -> identity
    np.testing.assert_allclose(np.asarray(T.op_brightness(img, jnp.float32(0.0))),
                               img_np, atol=1e-3)
    # equalize vs PIL
    from PIL import Image, ImageOps
    pil = Image.fromarray(img_np.astype(np.uint8))
    ref = np.asarray(ImageOps.equalize(pil)).astype(np.float32)
    ours = np.asarray(T.op_equalize(img, 0.0))
    np.testing.assert_allclose(ours, ref, atol=1.0)
    # autocontrast vs PIL
    ref_ac = np.asarray(ImageOps.autocontrast(pil)).astype(np.float32)
    ours_ac = np.asarray(T.op_autocontrast(img, 0.0))
    np.testing.assert_allclose(ours_ac, ref_ac, atol=2.0)


def test_random_erasing_stats():
    clip = jnp.ones((2, 32, 32, 3))
    erased = 0
    n = 40
    for i in range(n):
        out = np.asarray(T.random_erasing(jax.random.PRNGKey(i), clip, p=0.5))
        if (out != 1.0).any():
            erased += 1
            # cube mode: same block across frames
            m0 = (out[0] != 1.0).any(-1)
            m1 = (out[1] != 1.0).any(-1)
            np.testing.assert_array_equal(m0, m1)
    assert 5 < erased < 35  # p=0.5 of 40


def test_random_resized_crop_shape_and_content():
    rng = np.random.RandomState(3)
    clip = jnp.asarray(rng.rand(2, 128, 160, 3).astype(np.float32))
    out = T.random_resized_crop(jax.random.PRNGKey(0), clip, size=64)
    assert out.shape == (2, 64, 64, 3)
    o = np.asarray(out)
    assert o.min() >= 0 and o.max() <= 1.0


def test_hflip():
    clip = jnp.asarray(np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3))
    flipped = None
    for i in range(20):
        out = np.asarray(T.random_hflip(jax.random.PRNGKey(i), clip))
        if (out != np.asarray(clip)).any():
            np.testing.assert_array_equal(out, np.asarray(clip)[:, :, ::-1, :])
            flipped = True
    assert flipped


def test_loader_and_device_pipeline():
    ds = SyntheticAVE(n=8, num_frames=2, size=96, label_dim=5)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["frames"].shape == (4, 2, 96, 96, 3)
    pipe = make_ave_device_pipeline(train=False, image_size=96)
    a, v = pipe(b)
    assert v.shape == (4, 2, 96, 96, 3)
    assert a.shape == (4, 2, 224, 224)
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(v)).all()

    tpipe = make_ave_device_pipeline(train=True, image_size=96)
    a2, v2 = tpipe(b, jax.random.PRNGKey(0))
    assert v2.shape == (4, 2, 96, 96, 3)


def test_mixup_batch():
    k = jax.random.PRNGKey(0)
    B, Tn = 64, 2
    waves = jnp.asarray(np.random.RandomState(0).randn(B, Tn, 100), jnp.float32)
    w = T.mixup_batch(k, waves, mixup_prob=1.0)
    assert w.shape == waves.shape
    # statistical: Beta(10,10) lambdas center around 0.5, so mixed rows are
    # strict convex combinations — each mixed segment lies inside the per-pair
    # elementwise min/max envelope
    wn = np.asarray(w)
    assert not np.allclose(wn, np.asarray(waves))
    # per-second lambda: different seconds of the same sample get different
    # mixing weights almost surely
    r = wn - np.asarray(waves)
    assert np.abs(r[:, 0] - r[:, 1]).max() > 1e-6
    # prob=0 -> identity
    w0 = T.mixup_batch(k, waves, mixup_prob=0.0)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(waves))


def test_avqa_vocab_and_question_encoding(tmp_path):
    import json as _json
    from stgcma_tpu.data.datasets import build_avqa_vocab, encode_question
    samples = [
        {"video_id": "v1", "question_id": 1, "type": ["Audio", "Counting"],
         "question_content": "how many <Object> are there?",
         "templ_values": "[\"drums\"]", "anser": "two"},
        {"video_id": "v2", "question_id": 2, "type": ["Visual", "Location"],
         "question_content": "where is the <Object>?",
         "templ_values": "[\"piano\"]", "anser": "left"},
    ]
    p = tmp_path / "train.json"
    p.write_text(_json.dumps(samples))
    word2idx, ans2idx = build_avqa_vocab(str(p))
    assert word2idx["<pad>"] == 0
    assert "drums" in word2idx and "piano" in word2idx
    assert ans2idx == {"two": 0, "left": 1}
    ids = encode_question(samples[0]["question_content"],
                          samples[0]["templ_values"], word2idx)
    assert ids.shape == (14,)
    assert ids[2] == word2idx["drums"]  # templ substitution at '<Object>'
    assert ids[-1] == 0  # padded


def test_ave_dataset_corrupted_fallback(tmp_path):
    """Missing files produce the reference's substitute tensors, not a crash."""
    import h5py
    from stgcma_tpu.data.datasets import AVEDataset
    order_p, labels_p = str(tmp_path / "o.h5"), str(tmp_path / "l.h5")
    with h5py.File(order_p, "w") as f:
        f["order"] = np.array([0])
    with h5py.File(labels_p, "w") as f:
        f["avadataset"] = np.zeros((1, 10, 29), np.float32)
    ds = AVEDataset(order_p, labels_p, str(tmp_path / "frames"),
                    str(tmp_path / "audio"), num_frames=10)
    item = ds[0]
    assert item["frames"].shape == (10, 224, 224, 3)
    assert item["wave"].shape == (10, 16000)
