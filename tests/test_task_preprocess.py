"""Per-task visual preprocessing fidelity (VERDICT r2 item 3).

The reference uses DIFFERENT visual protocols per task:
  - AVE: RandAugment/rrc/flip/erase (train), short-side resize + center crop
    (eval) — AVE/dataloader.py:346-394, :159-164
  - AVQA: direct 224x224 BICUBIC resize + ImageNet normalize for BOTH train
    and eval — AVQA/dataloader.py:86-90
  - AVS: ToTensor + ImageNet Normalize only — AVS/dataloader.py:65-72

resize_bicubic parity oracle: torch.nn.functional.interpolate(mode='bicubic',
antialias=False) — the exact op torchvision's tensor-path Resize lowers to.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from stgcma_tpu.data import transforms
from stgcma_tpu.data.loader import (make_avqa_device_pipeline,
                                    make_avs_device_pipeline)
from stgcma_tpu.ops.resize import resize_bicubic

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("in_hw,out_hw", [
    ((360, 640), (224, 224)),   # real-shaped non-square video frame (downscale)
    ((180, 320), (224, 224)),   # upscale
    ((224, 224), (224, 224)),   # identity shape (still passes through resize)
    ((251, 187), (224, 224)),   # odd sizes
])
def test_resize_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.rand(2, in_hw[0], in_hw[1], 3).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), out_hw[0], out_hw[1]))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        xt, size=out_hw, mode="bicubic", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resize_bicubic_align_corners_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 17, 23, 3).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), 40, 40, align_corners=True))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        xt, size=(40, 40), mode="bicubic", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_avqa_transform_matches_reference_protocol():
    """avqa_transform == Resize([224,224], BICUBIC) + ImageNet Normalize on
    a non-square frame (where the old center-crop routing produced DIFFERENT
    tensors — the VERDICT r2 'what's missing' #1)."""
    rng = np.random.RandomState(2)
    clip = rng.randint(0, 256, (3, 360, 640, 3)).astype(np.uint8)
    ours = np.asarray(transforms.avqa_transform(jnp.asarray(clip), 224))
    xt = torch.from_numpy(clip.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(xt, size=(224, 224), mode="bicubic",
                                          align_corners=False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    ref = ((ref - mean) / std).permute(0, 2, 3, 1).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-3
    # and it differs from the AVE eval protocol on non-square frames
    ave = np.asarray(transforms.eval_transform(jnp.asarray(clip), 224))
    assert np.max(np.abs(ours - ave)) > 0.1


def test_avs_transform_is_normalize_only():
    rng = np.random.RandomState(3)
    clip = rng.randint(0, 256, (5, 224, 224, 3)).astype(np.uint8)
    ours = np.asarray(transforms.avs_transform(jnp.asarray(clip)))
    ref = (clip.astype(np.float32) / 255.0
           - np.array([0.485, 0.456, 0.406], np.float32)) \
        / np.array([0.229, 0.224, 0.225], np.float32)
    assert np.max(np.abs(ours - ref)) < 1e-6


def test_avqa_pipeline_shapes_and_determinism():
    """The AVQA pipe ignores rng (protocol has no randomness) and is identical
    for 'train' and 'eval' use."""
    import jax
    rng = np.random.RandomState(4)
    batch = {"frames": rng.randint(0, 256, (2, 4, 180, 320, 3)).astype(np.uint8),
             "wave": rng.randn(2, 4, 16000).astype(np.float32)}
    pipe = make_avqa_device_pipeline(image_size=224)
    a1, v1 = pipe(batch, jax.random.PRNGKey(0))
    a2, v2 = pipe(batch, jax.random.PRNGKey(123))
    assert v1.shape == (2, 4, 224, 224, 3)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_avs_pipeline_shapes():
    rng = np.random.RandomState(5)
    batch = {"frames": rng.randint(0, 256, (2, 5, 224, 224, 3)).astype(np.uint8),
             "wave": rng.randn(2, 5, 31200).astype(np.float32)}
    pipe = make_avs_device_pipeline()
    a, v = pipe(batch)
    assert v.shape == (2, 5, 224, 224, 3)
    assert a.shape[0] == 2 and a.shape[1] == 5
