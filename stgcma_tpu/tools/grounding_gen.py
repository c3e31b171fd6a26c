"""AVQA grounding/matching pretraining — offline stage (reference:
AVQA/grounding_gen/{main_grd_gen.py, nets_grd_gen.py, dataloader_grd_gen.py}).

Model: VGGish audio features (B,T,128) -> fc_a1/fc_a2; frozen ResNet18 layer4
visual features (stride-1 layer4 => 14x14); normalized dot-product grounding;
4-layer match MLP -> 2-way CE on interleaved pos/neg frame pairs.

The trained head weights splice into the AVQA model under avqatask_* names
(Swin_AVQAModel_V1.py:1520-1540) — here `splice_into_avqa` moves them directly
between param trees. `apply(..., return_attention=True)` reproduces the
*_vis heatmap-dump variant (main_grd_gen_vis.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.resnet import resnet18_features, resnet18_init
from ..ops.common import linear, linear_torch_default_init
from ..train.losses import cross_entropy_int


def init_grounding(key) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    return {
        "fc_a1": linear_torch_default_init(ks[0], 128, 512),
        "fc_a2": linear_torch_default_init(ks[1], 512, 512),
        "fc_gl": linear_torch_default_init(ks[2], 1024, 512),
        "fc1": linear_torch_default_init(ks[3], 1024, 512),
        "fc2": linear_torch_default_init(ks[4], 512, 256),
        "fc3": linear_torch_default_init(ks[5], 256, 128),
        "fc4": linear_torch_default_init(ks[6], 128, 2),
        "visual_net": resnet18_init(ks[7]),
    }


def _l2norm(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=axis,
                                           keepdims=True), 1e-12).astype(x.dtype)


def apply_grounding(p, audio, frames, return_attention: bool = False):
    """audio: (B, T, 128) VGGish; frames: (B, T, H, W, 3) normalized.
    Returns match logits (B*T, 2) [, attention (B*T, HW)]."""
    B, T = audio.shape[0], audio.shape[1]
    af = jax.nn.relu(linear(p["fc_a1"], audio))
    af = linear(p["fc_a2"], af).reshape(B * T, -1)          # (BT, 512)

    vis = frames.reshape((B * T,) + frames.shape[2:])
    feat = resnet18_features(p["visual_net"], vis)          # (BT, 14, 14, 512)
    v_before = feat.mean(axis=(1, 2))                       # (BT, 512)
    v = feat.reshape(B * T, -1, feat.shape[-1])
    v = _l2norm(v, axis=2)

    a_n = _l2norm(af[:, :, None], axis=1)
    x2_va = jnp.einsum("bnc,bcx->bnx", v, a_n)[..., 0]
    x2_p = jax.nn.softmax(x2_va.astype(jnp.float32), axis=-1).astype(v.dtype)
    grd = jnp.einsum("bn,bnc->bc", x2_p, v)
    gl = jnp.tanh(jnp.concatenate([v_before, grd], axis=-1))
    grd = linear(p["fc_gl"], gl)

    feat = jnp.concatenate([af, grd], axis=-1)
    feat = jax.nn.relu(linear(p["fc1"], feat))
    feat = jax.nn.relu(linear(p["fc2"], feat))
    feat = jax.nn.relu(linear(p["fc3"], feat))
    out = linear(p["fc4"], feat)
    if return_attention:
        return out, x2_p
    return out


def grounding_loss(p, audio, frames_pos, frames_neg):
    """CE on interleaved pos/neg pairs (main_grd_gen.py:27-50)."""
    out_pos = apply_grounding(p, audio, frames_pos)
    out_neg = apply_grounding(p, audio, frames_neg)
    n = out_pos.shape[0]
    out = jnp.stack([out_pos, out_neg], axis=1).reshape(2 * n, -1)
    labels = jnp.tile(jnp.array([1, 0], jnp.int32), n)
    return cross_entropy_int(out, labels)


def _jet_rgb(x: np.ndarray) -> np.ndarray:
    """Classic jet colormap (cv2.COLORMAP_JET equivalent, RGB float 0-1).
    x: float array in [0, 1]."""
    v = np.clip(x, 0.0, 1.0) * 4.0
    r = np.clip(np.minimum(v - 1.5, -v + 4.5), 0.0, 1.0)
    g = np.clip(np.minimum(v - 0.5, -v + 3.5), 0.0, 1.0)
    b = np.clip(np.minimum(v + 0.5, -v + 2.5), 0.0, 1.0)
    return np.stack([r, g, b], axis=-1)


HEAD_KEYS = ("fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4")

# r(2+1)d-18 video-model normalization stats (dataloader_grd_gen.py:21-22)
R2P1D_MEAN = np.array([0.43216, 0.394666, 0.37645], np.float32)
R2P1D_STD = np.array([0.22803, 0.22145, 0.216989], np.float32)


def splice_into_avqa(avqa_params: Dict[str, Any], grd_params: Dict[str, Any]):
    """Move the pretrained grounding head into the AVQA tree
    (the reference's avqatask_* key remap, Swin_AVQAModel_V1.py:1520-1540).
    Note the AVQA model's fc_a2/fc_gl/fc1 have different widths (1536-d
    features); only matching-shaped leaves are copied, like load_state_dict
    with filtered dicts."""
    hp = avqa_params["avqatask"]
    for k in HEAD_KEYS:
        if k not in hp or k not in grd_params:
            continue
        src, dst = grd_params[k], hp[k]
        if src["kernel"].shape == dst["kernel"].shape:
            hp[k] = jax.tree_util.tree_map(lambda x: x, src)
    return avqa_params


def export_torch_state_dict(params: Dict[str, Any], path: str):
    """Save the grounding head in the reference checkpoint layout
    ('module.<name>.weight/bias' torch state_dict, weight transposed to
    torch's (out, in)) so run_adapt_avqa --grounding_pretrained consumes it
    unchanged (main_grd_gen.py:224-227 torch.save of a DataParallel model).
    Only the spliceable head linears are exported — the frozen ResNet
    visual_net is not part of the splice (Swin_AVQAModel_V1.py:1520-1540)."""
    import torch
    sd = {}
    for k in HEAD_KEYS:
        sd[f"module.{k}.weight"] = torch.from_numpy(
            np.asarray(params[k]["kernel"], np.float32).T.copy())
        sd[f"module.{k}.bias"] = torch.from_numpy(
            np.asarray(params[k]["bias"], np.float32).copy())
    torch.save(sd, path)


# ---------------------------------------------------------------------------
# datasets (dataloader_grd_gen.py:64-127 schema)
# ---------------------------------------------------------------------------

class GroundingGenDataset:
    """Pos/neg frame pairs + per-second VGGish audio.

    Layout (dataloader_grd_gen.py:64-127): video_list = unique video_ids from
    the TRAIN json; length = 10 * n_videos; item idx -> pos video idx//10,
    frame idx%10; a negative frame is drawn from a different video; audio row
    frame_flag of `audio_dir/<video>.npy` (VGGish, (10, 128)). Frames load
    from `video_dir/<video>/` (sorted), resized to 224 (PIL bilinear) and
    normalized with the r(2+1)d stats."""

    def __init__(self, label_json: str, train_json: str, audio_dir: str,
                 video_dir: str, seed: int = 1):
        import json
        import os
        with open(train_json) as f:
            samples = json.load(f)
        self.video_list = list(dict.fromkeys(s["video_id"] for s in samples))
        self.audio_dir = audio_dir
        self.video_dir = video_dir
        self.rng = np.random.RandomState(seed)
        self._os = os

    def __len__(self):
        return 10 * len(self.video_list)

    def _frame(self, video: str, flag: int) -> np.ndarray:
        import os
        from PIL import Image
        d = os.path.join(self.video_dir, video)
        files = sorted(os.listdir(d))
        with Image.open(os.path.join(d, files[flag])) as im:
            im = im.convert("RGB").resize((224, 224), Image.BILINEAR)
            x = np.asarray(im, np.float32) / 255.0
        return (x - R2P1D_MEAN) / R2P1D_STD

    def __getitem__(self, idx: int):
        pos_video = self.video_list[idx // 10]
        flag = idx % 10
        while True:
            neg_idx = self.rng.randint(10 * len(self.video_list))
            if neg_idx // 10 != idx // 10:
                break
        neg_video = self.video_list[neg_idx // 10]
        audio = np.load(self._os.path.join(
            self.audio_dir, pos_video + ".npy")).astype(np.float32)[flag]
        return {"audio": audio,
                "frame_pos": self._frame(pos_video, flag),
                "frame_neg": self._frame(neg_video, neg_idx % 10)}


class SyntheticGrounding:
    """Deterministic stand-in (no data on disk) with fake 9-type labels for
    the per-type test breakdown."""

    _TYPES = [["Audio", "Counting"], ["Audio", "Comparative"],
              ["Visual", "Counting"], ["Visual", "Location"],
              ["Audio-Visual", "Existential"], ["Audio-Visual", "Counting"],
              ["Audio-Visual", "Location"], ["Audio-Visual", "Comparative"],
              ["Audio-Visual", "Temporal"]]

    def __init__(self, n: int = 8, seed: int = 0, img: int = 224):
        self.n = n
        self.seed = seed
        self.img = img

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        rng = np.random.RandomState(self.seed * 1000 + i)
        return {"audio": rng.randn(128).astype(np.float32),
                "frame_pos": rng.randn(self.img, self.img, 3).astype(np.float32),
                "frame_neg": rng.randn(self.img, self.img, 3).astype(np.float32),
                "qtype": self._TYPES[i % len(self._TYPES)]}


# ---------------------------------------------------------------------------
# trainer (main_grd_gen.py:27-237): Adam(lr) + StepLR(8, 0.1), CE on
# interleaved pos/neg pairs, frozen visual_net, per-epoch + best ckpt
# ---------------------------------------------------------------------------

def _collate(items):
    out = {}
    for k in items[0]:
        if k == "qtype":
            out[k] = [it[k] for it in items]
        else:
            out[k] = np.stack([it[k] for it in items])
    return out


def _batches(ds, batch_size, shuffle, rng):
    idx = np.arange(len(ds))
    if shuffle:
        rng.shuffle(idx)
    for i in range(0, len(idx), batch_size):
        yield _collate([ds[j] for j in idx[i:i + batch_size]])


def main(argv=None):
    import argparse
    import os
    import optax

    def s2b(v):
        return str(v).lower() in ("1", "true", "yes")

    p = argparse.ArgumentParser(
        description="AVQA grounding-module pretraining "
                    "(main_grd_gen.py flag surface)")
    p.add_argument("--audio_dir", type=str, default="./data/feats/vggish")
    p.add_argument("--video_dir", type=str, default="./data/frames")
    p.add_argument("--label_train", type=str,
                   default="./data/json/avqa-train_real.json")
    p.add_argument("--label_val", type=str,
                   default="./data/json/avqa-val_real.json")
    p.add_argument("--label_test", type=str,
                   default="./data/json/avqa-test_real.json")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "val", "test"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--model_save_dir", type=str,
                   default="./models_grounding_gen/")
    p.add_argument("--checkpoint", type=str, default="main_grounding_gen")
    p.add_argument("--synthetic", type=s2b, default=False,
                   help="train on deterministic random tensors (no data dirs)")
    p.add_argument("--synthetic_n", type=int, default=8)
    p.add_argument("--dump_heatmaps", type=str, default="",
                   help="in test mode, dump JET-overlay grounding heatmaps "
                        "here (main_grd_gen_vis.py equivalent)")
    p.add_argument("--resnet_pretrained", type=str, default="",
                   help="torchvision resnet18 .pth for the frozen visual net")
    args = p.parse_args(argv)

    np.random.seed(args.seed)
    params = init_grounding(jax.random.PRNGKey(args.seed))
    if args.resnet_pretrained:
        import torch
        from ..checkpoint.torch_convert import load_resnet18
        sd = torch.load(args.resnet_pretrained, map_location="cpu",
                        weights_only=False)
        params["visual_net"] = load_resnet18(params["visual_net"], sd)
        print(f"loaded resnet18 weights from {args.resnet_pretrained}")

    if args.synthetic:
        tr_ds = SyntheticGrounding(args.synthetic_n, seed=0)
        va_ds = SyntheticGrounding(max(2, args.synthetic_n // 2), seed=7)
        te_ds = va_ds
    else:
        tr_ds = GroundingGenDataset(args.label_train, args.label_train,
                                    args.audio_dir, args.video_dir, args.seed)
        va_ds = GroundingGenDataset(args.label_val, args.label_train,
                                    args.audio_dir, args.video_dir, args.seed)
        te_ds = GroundingGenDataset(args.label_test, args.label_train,
                                    args.audio_dir, args.video_dir, args.seed)

    # visual_net frozen (main_grd_gen.py:205-209); heads get torch-default
    # Adam + StepLR(step_size=8, gamma=0.1) (main_grd_gen.py:211-212)
    head = {k: params[k] for k in HEAD_KEYS}
    frozen_visual = params["visual_net"]
    steps_per_epoch = max(1, len(tr_ds) // args.batch_size)
    step_to_epoch = jnp.repeat(jnp.arange(max(args.epochs, 1)),
                               steps_per_epoch)

    def lr_fn(step):
        ep = step_to_epoch[jnp.minimum(step, step_to_epoch.shape[0] - 1)]
        return args.lr * jnp.asarray(0.1, jnp.float32) ** (ep // 8)

    tx = optax.adam(learning_rate=lr_fn)
    opt_state = tx.init(head)

    def arrays(batch):
        return {k: v for k, v in batch.items() if k != "qtype"}

    @jax.jit
    def train_step(head, opt_state, batch):
        def loss_of(h):
            full = {**h, "visual_net": frozen_visual}
            return grounding_loss(full, batch["audio"][:, None],
                                  batch["frame_pos"][:, None],
                                  batch["frame_neg"][:, None])
        loss, grads = jax.value_and_grad(loss_of)(head)
        updates, opt_state = tx.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, loss

    @jax.jit
    def infer(head, batch):
        full = {**head, "visual_net": frozen_visual}
        out_pos = apply_grounding(full, batch["audio"][:, None],
                                  batch["frame_pos"][:, None])
        out_neg = apply_grounding(full, batch["audio"][:, None],
                                  batch["frame_neg"][:, None])
        n = out_pos.shape[0]
        out = jnp.stack([out_pos, out_neg], axis=1).reshape(2 * n, -1)
        return jnp.argmax(out, axis=-1)

    def evaluate(head, ds):
        correct = total = 0
        rng = np.random.RandomState(0)
        for batch in _batches(ds, args.batch_size, False, rng):
            pred = np.asarray(infer(head, arrays(batch)))
            target = np.tile([1, 0], pred.shape[0] // 2)
            correct += int((pred == target).sum())
            total += pred.shape[0]
        acc = 100.0 * correct / max(total, 1)
        print(f"Accuracy: {acc:.2f} %")
        return acc

    def test_types(head, ds):
        """Per-question-type breakdown (main_grd_gen.py:72-148; requires the
        dataset to expose a 'qtype' per item — synthetic or a real test json
        zipped by index as the reference does with batch_size=1)."""
        from ..metrics.stats import avqa_type_accuracy
        preds, answers, qtypes = [], [], []
        rng = np.random.RandomState(0)
        for batch in _batches(ds, 1, False, rng):
            pred = np.asarray(infer(head, arrays(batch)))
            preds.extend(pred.tolist())
            answers.extend([1, 0])
            t = batch.get("qtype", [["", ""]])[0]
            qtypes.extend([t, t])
        res = avqa_type_accuracy(preds, answers, qtypes)
        for k, v in sorted(res.items()):
            print(f"{k} Accuracy: {v:.2f} %")
        return res.get("Overall", 0.0)

    @jax.jit
    def attention_maps(head, batch):
        full = {**head, "visual_net": frozen_visual}
        _, att = apply_grounding(full, batch["audio"][:, None],
                                 batch["frame_pos"][:, None],
                                 return_attention=True)
        return att                                          # (B, 196)

    def dump_heatmaps(head, ds, out_dir):
        """main_grd_gen_vis.py:82-104 equivalent: bilinear-resize the 14x14
        grounding attention to 224^2, JET-colormap it, overlay
        0.4*heat + 0.6*frame, save one PNG per positive frame (PIL instead
        of cv2 — not in this image)."""
        from PIL import Image
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        n_out = 0
        for batch in _batches(ds, args.batch_size, False, rng):
            att = np.asarray(attention_maps(head, arrays(batch)), np.float32)
            frames = np.asarray(batch["frame_pos"], np.float32)  # normalized
            for i in range(att.shape[0]):
                amap = att[i].reshape(14, 14)
                amap = amap / max(float(amap.max()), 1e-12)
                img = Image.fromarray((amap * 255).astype(np.uint8))
                amap = np.asarray(img.resize((224, 224), Image.BILINEAR),
                                  np.float32) / 255.0
                heat = _jet_rgb(amap)                        # (224,224,3) 0-1
                fr = frames[i] * R2P1D_STD + R2P1D_MEAN      # denormalize
                fr = np.clip(fr, 0.0, 1.0)
                if fr.shape[:2] != (224, 224):
                    fr = np.asarray(Image.fromarray(
                        (fr * 255).astype(np.uint8)).resize(
                            (224, 224), Image.BILINEAR), np.float32) / 255.0
                over = np.clip(heat * 0.4 + fr * 0.6, 0.0, 1.0)
                name = batch.get("name", [f"sample_{n_out}"] * att.shape[0])
                fname = f"{name[i] if i < len(name) else n_out}_{i}.png"
                Image.fromarray((over * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, fname))
                n_out += 1
        print(f"wrote {n_out} heatmap overlays to {out_dir}")

    os.makedirs(args.model_save_dir, exist_ok=True)

    def ckpt_path(tag):
        return os.path.join(args.model_save_dir,
                            f"{args.checkpoint}{tag}.pt")

    if args.mode == "train":
        best = -1.0
        rng = np.random.RandomState(args.seed)
        for epoch in range(1, args.epochs + 1):
            for bi, batch in enumerate(
                    _batches(tr_ds, args.batch_size, True, rng)):
                head, opt_state, loss = train_step(head, opt_state, arrays(batch))
                if bi % args.log_interval == 0:
                    print(f"Train Epoch: {epoch} [{bi}]\t"
                          f"Loss: {float(loss):.6f}")
            acc = evaluate(head, va_ds)
            export_torch_state_dict(head, ckpt_path(str(epoch)))
            if acc >= best:
                best = acc
                export_torch_state_dict(head, ckpt_path("_best"))
        print(f"done. best val acc {best:.2f} %")
    else:
        import torch
        sd = torch.load(ckpt_path("_best"), map_location="cpu",
                        weights_only=False)
        for k in HEAD_KEYS:
            head[k] = {"kernel": jnp.asarray(
                sd[f"module.{k}.weight"].numpy().T),
                "bias": jnp.asarray(sd[f"module.{k}.bias"].numpy())}
        if args.mode == "val":
            evaluate(head, va_ds)
        else:
            test_types(head, te_ds)
            if args.dump_heatmaps:
                dump_heatmaps(head, te_ds, args.dump_heatmaps)


if __name__ == "__main__":
    main()
