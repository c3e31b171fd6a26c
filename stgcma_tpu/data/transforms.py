"""TPU-resident clip transforms: the reference's per-frame PIL hot loop
(transforms/video_transforms.py, rand_augment.py, random_erasing.py — SURVEY §2.4)
re-derived as batched tensor math over packed (T, H, W, C) clips.

Eval path (AVE/dataloader.py:159-164):
    short-side bilinear resize -> center crop 224 -> /255 -> ImageNet normalize.
Train path (AVE/dataloader.py:346-394):
    RandAugment(rand-m7-n4-mstd0.5-inc1) -> normalize -> random_resized_crop
    (scale [.08,1], ratio [3/4,4/3]) -> hflip(0.5) -> RandomErasing(0.25,'pixel').

Stochastic ops follow timm's magnitude semantics but use jax PRNG; parity with
PIL is statistical, not bitwise (SURVEY §7 step 5).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# deterministic eval pipeline
# ---------------------------------------------------------------------------

def resize_short_side(clip, size: int):
    """Bilinear resize so the short side == size. clip: (..., H, W, C)."""
    H, W = clip.shape[-3], clip.shape[-2]
    if H <= W:
        nh, nw = size, max(int(round(W * size / H)), size)
    else:
        nh, nw = max(int(round(H * size / W)), size), size
    from ..ops.resize import resize_bilinear
    return resize_bilinear(clip.astype(jnp.float32), nh, nw, align_corners=False)


def center_crop(clip, size: int):
    H, W = clip.shape[-3], clip.shape[-2]
    top, left = (H - size) // 2, (W - size) // 2
    return clip[..., top:top + size, left:left + size, :]


def normalize(clip01, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    return (clip01 - jnp.asarray(mean)) / jnp.asarray(std)


def eval_transform(clip_uint8, size: int = 224):
    """(T, H, W, 3) uint8 -> (T, size, size, 3) normalized float32."""
    x = resize_short_side(clip_uint8, size)
    x = center_crop(x, size)
    return normalize(x / 255.0)


def avqa_transform(clip_uint8, size: int = 224):
    """AVQA visual protocol — BOTH train and eval: direct (size, size)
    BICUBIC resize (aspect-distorting, torch interpolate semantics) +
    ImageNet normalize; no crop/RandAugment/flip (AVQA/dataloader.py:86-90:
    Resize([224,224], BICUBIC) + Normalize on read_image(..)/255 tensors)."""
    from ..ops.resize import resize_bicubic
    x = clip_uint8.astype(jnp.float32) / 255.0
    if x.shape[-3] != size or x.shape[-2] != size:
        x = resize_bicubic(x, size, size)
    return normalize(x)


def avs_transform(clip_uint8):
    """AVS visual protocol — BOTH train and eval: ToTensor + ImageNet
    Normalize only (AVS/dataloader.py:65-72); frames come pre-sized 224x224
    from the offline preprocess (AVS/preprocess/preprocess_s4.py)."""
    return normalize(clip_uint8.astype(jnp.float32) / 255.0)


# ---------------------------------------------------------------------------
# affine sampling core (PIL-style inverse mapping, bilinear, gray fill)
# ---------------------------------------------------------------------------

def _affine_sample(img, inv_mat, fill: float = 128.0):
    """img: (H, W, C) f32; inv_mat: (2, 3) output->input map (PIL convention)."""
    H, W, C = img.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    sy = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = sx - x0; wy = sy - y0
    valid = (sx >= -1) & (sx <= W) & (sy >= -1) & (sy <= H)

    def gather(yi, xi):
        okx = (xi >= 0) & (xi < W)
        oky = (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[yi_c, xi_c]
        return jnp.where((okx & oky)[..., None], vals, fill)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 + (v01 - v00) * wx[..., None]
    bot = v10 + (v11 - v10) * wx[..., None]
    out = top + (bot - top) * wy[..., None]
    return jnp.where(valid[..., None], out, fill)


def _center_affine(img, a, b, c, d):
    """Affine [[a,b],[c,d]] about the image center (PIL rotate/shear style)."""
    H, W, _ = img.shape
    cx, cy = W / 2.0, H / 2.0
    tx = cx - a * cx - b * cy
    ty = cy - c * cx - d * cy
    return _affine_sample(img, jnp.array([[a, b, tx], [c, d, ty]], jnp.float32))


# ---------------------------------------------------------------------------
# RandAugment ops on (H, W, C) float32 in [0, 255]
# ---------------------------------------------------------------------------

def _blend(img1, img2, factor):
    return jnp.clip(img2 + (img1 - img2) * factor, 0.0, 255.0)


def _grayscale(img):
    l = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.broadcast_to(l[..., None], img.shape)


def op_identity(img, m):  # noqa: ARG001
    return img


def op_autocontrast(img, m):  # noqa: ARG001
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), img)


def op_equalize(img, m):  # noqa: ARG001
    def eq_chan(c):
        ci = jnp.clip(c, 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.int32).at[ci.reshape(-1)].add(1)
        # PIL: step = (total - last_nonzero_bin) // 255
        nz = hist > 0
        last = jnp.max(jnp.where(nz, jnp.arange(256), 0))
        step = (ci.size - hist[last]) // 255
        lut = (jnp.cumsum(hist) - hist + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        return jnp.where(step > 0, lut[ci].astype(img.dtype), c)
    return jnp.stack([eq_chan(img[..., k]) for k in range(3)], axis=-1)


def op_invert(img, m):  # noqa: ARG001
    return 255.0 - img


def op_rotate(img, m):
    deg = 30.0 * m / 10.0
    rad = deg * math.pi / 180.0
    return _center_affine(img, jnp.cos(rad), jnp.sin(rad), -jnp.sin(rad), jnp.cos(rad))


def op_posterize(img, m):
    # PosterizeIncreasing: bits 4 - int(4 * m / 10)
    bits = jnp.clip(4 - (4 * m / 10.0).astype(jnp.int32), 0, 8)
    shift = (8 - bits).astype(jnp.int32)
    q = (jnp.clip(img, 0, 255).astype(jnp.int32) >> shift) << shift
    return q.astype(img.dtype)


def op_solarize(img, m):
    # SolarizeIncreasing: thresh 256 - int(256 * m / 10)
    thresh = 256.0 - 256.0 * m / 10.0
    return jnp.where(img < thresh, img, 255.0 - img)


def op_solarize_add(img, m):
    add = 110.0 * m / 10.0
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _enhance_factor(m):
    # 'Increasing' enhance: 1 + 0.9 * m/10 * sign (sign randomized by caller via m)
    return 1.0 + 0.9 * m / 10.0


def op_color(img, m):
    return _blend(img, _grayscale(img), _enhance_factor(m))


def op_contrast(img, m):
    mean = _grayscale(img).mean(axis=(0, 1), keepdims=True)
    return _blend(img, jnp.broadcast_to(mean, img.shape), _enhance_factor(m))


def op_brightness(img, m):
    return _blend(img, jnp.zeros_like(img), _enhance_factor(m))


def op_sharpness(img, m):
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    sm = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0].transpose(1, 2, 0)
    return _blend(img, sm, _enhance_factor(m))


def op_shear_x(img, m):
    s = 0.3 * m / 10.0
    return _center_affine(img, 1.0, s, 0.0, 1.0)


def op_shear_y(img, m):
    s = 0.3 * m / 10.0
    return _center_affine(img, 1.0, 0.0, s, 1.0)


def op_translate_x(img, m):
    t = 0.45 * m / 10.0 * img.shape[1]
    return _affine_sample(img, jnp.array([[1.0, 0.0, t], [0.0, 1.0, 0.0]], jnp.float32))


def op_translate_y(img, m):
    t = 0.45 * m / 10.0 * img.shape[0]
    return _affine_sample(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, t]], jnp.float32))


RA_OPS = (op_autocontrast, op_equalize, op_invert, op_rotate, op_posterize,
          op_solarize, op_solarize_add, op_color, op_contrast, op_brightness,
          op_sharpness, op_shear_x, op_shear_y, op_translate_x, op_translate_y)
# ops whose magnitude can be negated (bidirectional)
_SIGNED = np.array([0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1], np.float32)


def rand_augment(rng, clip, num_layers: int = 4, magnitude: float = 7.0,
                 mag_std: float = 0.5):
    """timm 'rand-m7-n4-mstd0.5-inc1' over a whole clip (same ops for every frame,
    matching create_random_augment applied to the frame list). clip: (T,H,W,C)
    float32 [0,255]."""
    n_ops = len(RA_OPS)
    keys = jax.random.split(rng, 3)
    op_idx = jax.random.randint(keys[0], (num_layers,), 0, n_ops)
    mags = magnitude + mag_std * jax.random.normal(keys[1], (num_layers,))
    mags = jnp.clip(mags, 0.0, 10.0)
    signs = jnp.where(jax.random.bernoulli(keys[2], 0.5, (num_layers,)), 1.0, -1.0)

    def apply_one_frame(img):
        def body(i, im):
            idx = op_idx[i]
            m = mags[i] * jnp.where(jnp.asarray(_SIGNED)[idx] > 0, signs[i], 1.0)
            return jax.lax.switch(idx, [functools.partial(f) for f in RA_OPS], im, m)
        return jax.lax.fori_loop(0, num_layers, body, img)

    return jax.vmap(apply_one_frame)(clip)


# ---------------------------------------------------------------------------
# spatial sampling + erasing (train)
# ---------------------------------------------------------------------------

def random_resized_crop(rng, clip, size: int = 224,
                        scale=(0.08, 1.0), ratio=(3. / 4., 4. / 3.)):
    """torchvision-style RandomResizedCrop on the whole clip (same crop for all
    frames — video_transforms.random_resized_crop). clip: (T,H,W,C) f32."""
    from ..ops.resize import resize_bilinear
    T, H, W, C = clip.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = H * W
    target_area = area * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(k2, (), minval=math.log(ratio[0]),
                                   maxval=math.log(ratio[1]))
    ar = jnp.exp(log_ratio)
    w = jnp.sqrt(target_area * ar)
    h = jnp.sqrt(target_area / ar)
    w = jnp.clip(w, 8.0, W).astype(jnp.int32)
    h = jnp.clip(h, 8.0, H).astype(jnp.int32)
    top = jax.random.randint(k3, (), 0, jnp.maximum(H - h, 1))
    left = jax.random.randint(k4, (), 0, jnp.maximum(W - w, 1))
    # dynamic crop + resize fused as a bilinear gather with static output size
    fy = top + (jnp.arange(size, dtype=jnp.float32) + 0.5) * h / size - 0.5
    fx = left + (jnp.arange(size, dtype=jnp.float32) + 0.5) * w / size - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, W - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(fy - y0, 0.0, 1.0)[None, :, None, None]
    wx = jnp.clip(fx - x0, 0.0, 1.0)[None, None, :, None]
    r0 = clip[:, y0][:, :, x0]
    r1 = clip[:, y0][:, :, x1]
    r2 = clip[:, y1][:, :, x0]
    r3 = clip[:, y1][:, :, x1]
    top_i = r0 + (r1 - r0) * wx
    bot_i = r2 + (r3 - r2) * wx
    return top_i + (bot_i - top_i) * wy


def random_hflip(rng, clip, p: float = 0.5):
    flip = jax.random.bernoulli(rng, p)
    return jnp.where(flip, clip[:, :, ::-1, :], clip)


def random_erasing(rng, clip, p: float = 0.25, scale=(0.02, 1. / 3.),
                   ratio=(0.3, 3.3)):
    """timm RandomErasing mode='pixel' (per-pixel gaussian fill), same block for
    all frames ('cube' semantics) (transforms/random_erasing.py:35-174)."""
    T, H, W, C = clip.shape
    ks = jax.random.split(rng, 6)
    do = jax.random.bernoulli(ks[0], p)
    area = H * W
    target = area * jax.random.uniform(ks[1], (), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(ks[2], (), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    ar = jnp.exp(log_r)
    h = jnp.clip(jnp.sqrt(target * ar), 1, H - 1).astype(jnp.int32)
    w = jnp.clip(jnp.sqrt(target / ar), 1, W - 1).astype(jnp.int32)
    top = jax.random.randint(ks[3], (), 0, jnp.maximum(H - h, 1))
    left = jax.random.randint(ks[4], (), 0, jnp.maximum(W - w, 1))
    noise = jax.random.normal(ks[5], clip.shape, clip.dtype)
    yy = jnp.arange(H)[None, :, None, None]
    xx = jnp.arange(W)[None, None, :, None]
    inside = (yy >= top) & (yy < top + h) & (xx >= left) & (xx < left + w)
    return jnp.where(do & inside, noise, clip)


def mixup_batch(rng, waves, mixup_prob: float = 0.5, alpha: float = 10.0):
    """Reference AVE mixup (AVE/dataloader.py:204-230 + 491-497): with prob
    `mixup_prob` per sample, mix the centered waveform with a random partner's
    waveform using a FRESH Beta(10,10) lambda per second. Frames and labels are
    NOT mixed — the reference discards _wav2fbank's returned mix_lambda.

    Centered-waveform mixing commutes with segment cutting (the re-centering in
    _wav2fbank is a no-op on already-centered operands), so mixing the
    per-second segments device-side is exact.

    waves: (B, T, L) centered waveform segments -> mixed (B, T, L)."""
    B, T = waves.shape[0], waves.shape[1]
    k1, k2, k3 = jax.random.split(rng, 3)
    lam = jax.random.beta(k1, alpha, alpha, (B, T)).astype(waves.dtype)
    do = jax.random.bernoulli(k2, mixup_prob, (B,))
    lam = jnp.where(do[:, None], lam, 1.0)
    partner = jax.random.randint(k3, (B,), 0, B)
    l = lam[..., None]
    return l * waves + (1 - l) * waves[partner]


def train_transform(rng, clip_uint8, size: int = 224, magnitude: float = 7.0,
                    num_layers: int = 4):
    """Full reference train-time pipeline on a packed clip
    (AVE/dataloader.py:346-394). (T,H,W,3) uint8 -> (T,size,size,3) f32."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x = clip_uint8.astype(jnp.float32)
    x = rand_augment(k1, x, num_layers=num_layers, magnitude=magnitude)
    x = normalize(x / 255.0)
    x = random_resized_crop(k2, x, size=size)
    x = random_hflip(k3, x)
    x = random_erasing(k4, x)
    return x
