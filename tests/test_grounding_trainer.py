"""Runnable grounding_gen trainer (VERDICT r2 item 5): synthetic training,
reference-layout checkpoint export, and splice into the AVQA CLI params.

Reference: AVQA/grounding_gen/main_grd_gen.py:27-237 (Adam + StepLR CE loop,
per-epoch + best ckpt), dataloader_grd_gen.py:64-127 (pos/neg frame pairs +
VGGish .npy rows).
"""
import json
import os

import numpy as np
import pytest

from stgcma_tpu.tools import grounding_gen as G

torch = pytest.importorskip("torch")


def test_synthetic_training_exports_reference_layout(tmp_path):
    save = str(tmp_path / "models")
    G.main(["--synthetic", "True", "--epochs", "1", "--batch-size", "2",
            "--synthetic_n", "4", "--log-interval", "10",
            "--model_save_dir", save])
    best = os.path.join(save, "main_grounding_gen_best.pt")
    assert os.path.exists(best)
    sd = torch.load(best, map_location="cpu", weights_only=False)
    # reference DataParallel layout: module.<fc>.weight with torch (out, in)
    assert "module.fc_a1.weight" in sd
    assert tuple(sd["module.fc_a1.weight"].shape) == (512, 128)
    assert tuple(sd["module.fc4.weight"].shape) == (2, 128)
    for k in G.HEAD_KEYS:
        assert f"module.{k}.weight" in sd and f"module.{k}.bias" in sd


def test_export_splices_into_avqa_cli_params(tmp_path):
    import jax
    import jax.numpy as jnp
    from stgcma_tpu.configs import AVQAHeadConfig, swin_tiny_test
    from stgcma_tpu.models import avqa

    params = G.init_grounding(jax.random.PRNGKey(0))
    path = str(tmp_path / "grd.pt")
    G.export_torch_state_dict(params, path)

    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    hcfg = AVQAHeadConfig(feat_dim=cfg.num_features, grid=7, num_frames=2)
    avqa_p = avqa.init_avqa(jax.random.PRNGKey(1), cfg, hcfg)
    # fc2/fc3/fc4 are width-fixed (512->256->128->2) in both models; the
    # round-trip through the torch layout must land the exact values
    sd = torch.load(path, map_location="cpu", weights_only=False)
    got = sd["module.fc2.weight"].numpy().T
    np.testing.assert_allclose(got, np.asarray(params["fc2"]["kernel"]),
                               rtol=0, atol=0)
    # direct param-tree splice keeps matching-shaped heads
    spliced = G.splice_into_avqa(avqa_p, params)
    np.testing.assert_array_equal(
        np.asarray(spliced["avqatask"]["fc3"]["kernel"]),
        np.asarray(params["fc3"]["kernel"]))


def test_grounding_dataset_schema(tmp_path):
    """GroundingGenDataset follows dataloader_grd_gen.py:64-127: len =
    10 * unique train videos, VGGish row per frame flag, neg from a
    different video."""
    from PIL import Image
    vids = ["vidA", "vidB"]
    train_json = tmp_path / "train.json"
    train_json.write_text(json.dumps(
        [{"video_id": v} for v in vids for _ in range(2)]))  # dup entries
    audio_dir = tmp_path / "vggish"
    video_dir = tmp_path / "frames"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    for v in vids:
        np.save(audio_dir / f"{v}.npy", rng.randn(10, 128).astype(np.float32))
        d = video_dir / v
        d.mkdir(parents=True)
        for i in range(10):
            Image.fromarray(
                rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)).save(
                d / f"{i:05d}.jpg")
    ds = G.GroundingGenDataset(str(train_json), str(train_json),
                               str(audio_dir), str(video_dir))
    assert len(ds) == 20  # 10 per unique video
    it = ds[3]
    assert it["audio"].shape == (128,)
    assert it["frame_pos"].shape == (224, 224, 3)  # PIL bilinear 224 resize
    ref = np.load(audio_dir / "vidA.npy")[3]
    np.testing.assert_array_equal(it["audio"], ref)


def test_heatmap_dump_vis_variant(tmp_path):
    """main_grd_gen_vis.py equivalent: test mode with --dump_heatmaps writes
    224^2 JET-overlay PNGs (one per positive test frame)."""
    import numpy as np
    from PIL import Image

    from stgcma_tpu.tools import grounding_gen as G

    d = str(tmp_path / "m")
    G.main(["--synthetic", "True", "--epochs", "1", "--batch-size", "2",
            "--synthetic_n", "4", "--model_save_dir", d])
    vis = str(tmp_path / "vis")
    G.main(["--synthetic", "True", "--synthetic_n", "4", "--mode", "test",
            "--batch-size", "2", "--model_save_dir", d,
            "--dump_heatmaps", vis])
    import os
    pngs = sorted(os.listdir(vis))
    assert len(pngs) == 2
    img = np.asarray(Image.open(os.path.join(vis, pngs[0])))
    assert img.shape == (224, 224, 3)
    assert img.std() > 0  # a real overlay, not a constant fill


def test_jet_colormap_endpoints():
    from stgcma_tpu.tools.grounding_gen import _jet_rgb
    import numpy as np
    lo = _jet_rgb(np.zeros((1,)))[0]
    hi = _jet_rgb(np.ones((1,)))[0]
    mid = _jet_rgb(np.full((1,), 0.5))[0]
    assert lo[2] > 0.4 and lo[0] == 0.0    # dark blue end
    assert hi[0] > 0.4 and hi[2] == 0.0    # red end
    assert mid[1] == 1.0                   # green center
