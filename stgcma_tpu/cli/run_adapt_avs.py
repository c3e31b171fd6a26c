"""AVSBench S4/MS3 experiment driver (reference entry point: AVS/run_adapt_avs.py).

Trains the Swin fusion backbone + ASPP/TPAVI/FPN decoder with the F1-IoU BCE
loss, evaluates MIoU, optionally dumps predicted masks as PNGs (AVS/test.py).
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVSHeadConfig, swin_base, swin_large, swin_tiny_test
from ..data.datasets import AVSDataset
from ..data.loader import DataLoader, make_avs_device_pipeline
from ..models import avs
from ..ops.fbank import SWIN_FBANK
from ..train import losses
from ..train.loop import Trainer
from .common import archive_args, seed_everything, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MM-Swin-AVS-Large",
                   choices=["MM-Swin-AVS-Base", "MM-Swin-AVS-Large"])
    p.add_argument("--session", default="S4", choices=["S4", "MS3"])
    p.add_argument("--ftmode", default="fusion",
                   choices=["videoonly", "audioonly", "multimodal", "fusion"])
    p.add_argument("--dataset", default="avsbench")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--head_lr", type=float, default=0.1)
    p.add_argument("--min_lr", type=float, default=1e-7)
    p.add_argument("--warmup_epochs", type=int, default=1)
    p.add_argument("--warmup", type=str2bool, default=True)
    p.add_argument("--n-epochs", "--n_epochs", dest="n_epochs", type=int, default=15)
    p.add_argument("--batch_size", "--batch-size", dest="batch_size",
                   type=int, default=2)
    p.add_argument("--num_frames", type=int, default=5)
    p.add_argument("--adapter_ratios", type=float, nargs="*", default=None)
    p.add_argument("--tpavi_stages", type=int, nargs="*", default=[0, 1, 2, 3])
    p.add_argument("--sa_loss", type=str2bool, default=False)
    p.add_argument("--lambda_1", type=float, default=0.0)
    p.add_argument("--exp-dir", "--exp_dir", dest="exp_dir", default="./exp/avs")
    p.add_argument("--pretrain_path", default="")
    p.add_argument("--freeze_base", type=str2bool, default=True)
    # the reference train loop hardcodes IouSemanticAwareLoss whatever
    # --loss says (AVS/traintest_adapt_avs.py:162); CE/BCE warn below
    p.add_argument("--loss", default="IoU", choices=["IoU", "CE", "BCE"])
    p.add_argument("--metrics", default="miou",
                   choices=["miou", "acc", "mAP"])
    # weight averaging over per-epoch ckpts (AVS/run_adapt_avs.py:243-252)
    p.add_argument("--wa", type=str2bool, default=False)
    p.add_argument("--wa_start", type=int, default=1)
    p.add_argument("--wa_end", type=int, default=5)
    # scheduler selection (AVS/traintest_adapt_avs.py:82-110)
    p.add_argument("--lr_adapt", type=str2bool, default=False)
    p.add_argument("--lr_patience", type=int, default=2)
    p.add_argument("--lr_cosine_adapt", type=str2bool, default=True)
    p.add_argument("--lrscheduler_start", type=int, default=10)
    p.add_argument("--lrscheduler_step", type=int, default=5)
    p.add_argument("--lrscheduler_decay", type=float, default=0.5)
    # balanced sampler (AVS/run_adapt_avs.py:113-121)
    p.add_argument("--bal", default="none")
    p.add_argument("--weight_file", default=None)
    p.add_argument("--weight_csv", default="")
    p.add_argument("--save_model", type=str2bool, default=True)
    p.add_argument("--meta_csv", default="")
    p.add_argument("--data_root", default="")
    # reference per-kind data roots (AVS/run_adapt_avs.py:89-92 + S4Dataset);
    # override the data_root's fixed visual_frames/gt_masks/audio_wav layout.
    # dir_audio_log_mel (precomputed VGGish pkls) is accepted for surface
    # parity; the TPU pipeline computes log-mel from the wav on device.
    p.add_argument("--dir_image", default="")
    p.add_argument("--dir_mask", default="")
    p.add_argument("--dir_audio_wav", default="")
    p.add_argument("--dir_audio_log_mel", default="")
    p.add_argument("--num_workers", "--num-workers", dest="num_workers",
                   type=int, default=8)
    p.add_argument("--dataset_mean", type=float, default=-5.269)
    p.add_argument("--dataset_std", type=float, default=4.578)
    p.add_argument("--target_length", type=int, default=None)
    # parsed-but-inert in the reference AVS driver (S4Dataset's audio_conf
    # carries only mode/dirs/mean/std; finetune_path has no reader)
    p.add_argument("--freqm", type=int, default=0)
    p.add_argument("--timem", type=int, default=0)
    p.add_argument("--noise", type=str2bool, default=False)
    p.add_argument("--label_smooth", type=float, default=0.0)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--finetune_path", default="")
    p.add_argument("--save_mask_dir", default="")
    p.add_argument("--synthetic", type=str2bool, default=False)
    p.add_argument("--tiny", type=str2bool, default=False)
    # mid-training resume (beyond the reference — SURVEY §5 gap; restores
    # train params + opt state + LR position from exp_dir/state)
    p.add_argument("--resume", type=str2bool, default=False)
    # ablation switches (AVS/run_adapt_avs_ablation.sh variants)
    p.add_argument("--eval_only", type=str2bool, default=False)
    p.add_argument("--ckpt", default="")
    p.add_argument("--use_temporal_attn", type=str2bool, default=True)
    p.add_argument("--use_t_adapter", type=str2bool, default=True)
    p.add_argument("--use_s_adapter", type=str2bool, default=True)
    p.add_argument("--use_g_adapter", type=str2bool, default=True)
    return p.parse_args(argv)


class SyntheticAVS:
    def __init__(self, n=4, num_frames=5, size=224, seed=0, split="train"):
        self.n, self.T, self.size, self.seed = n, num_frames, size, seed
        self.split = split

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        k = 1 if self.split == "train" else self.T
        return {"frames": rng.randint(0, 256, (self.T, self.size, self.size, 3),
                                      np.uint8),
                "wave": (rng.randn(self.T, 31200) * 0.1).astype(np.float32),
                "masks": (rng.rand(k, self.size, self.size) > 0.5)
                .astype(np.float32)}


def build(args):
    abl = dict(use_temporal_attn=args.use_temporal_attn,
               use_t_adapter=args.use_t_adapter,
               use_s_adapter=args.use_s_adapter,
               use_g_adapter=args.use_g_adapter)
    if args.tiny:
        cfg = swin_tiny_test(ftmode=args.ftmode, num_frames=args.num_frames,
                             **abl)
        hcfg = AVSHeadConfig(stage_dims=(cfg.embed_dim, cfg.embed_dim * 2),
                             stage_resolutions=(14, 7), vis_dim=(64, 128),
                             tpavi_stages=(0, 1), audio_dim=cfg.num_features,
                             num_frames=args.num_frames)
    else:
        mk = swin_base if args.model.endswith("Base") else swin_large
        cfg = mk(ftmode=args.ftmode, num_frames=args.num_frames, **abl,
                 **({"adapter_ratios": tuple(args.adapter_ratios)}
                    if args.adapter_ratios else {}))
        hcfg = AVSHeadConfig(stage_dims=tuple(cfg.stage_dim(i) for i in range(4)),
                             tpavi_stages=tuple(args.tpavi_stages),
                             audio_dim=cfg.num_features,
                             num_frames=args.num_frames)
    return cfg, hcfg


def main(argv=None):
    args = parse_args(argv)
    # multi-host bring-up (no-op unless STGCMA_COORDINATOR/_DISTRIBUTED set)
    from ..runtime.mesh import init_distributed
    init_distributed()
    if args.ftmode != "fusion":
        # the reference AVS model's videoonly/audioonly/multimodal branches
        # are vestigial AVE-style mlp_head classification paths that the AVS
        # training loop cannot consume (loss expects the fusion outputs) — the
        # flag is kept for reference-surface compatibility but only fusion is
        # runnable (same as the reference launch scripts)
        raise SystemExit(f"--ftmode {args.ftmode} is not a runnable AVS "
                         "mode: the reference branch returns an AVE-style "
                         "classification head output the AVS loss cannot "
                         "consume; use --ftmode fusion")
    rng = seed_everything(0)
    archive_args(args, args.exp_dir)
    cfg, hcfg = build(args)
    params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
    if args.pretrain_path:
        import torch
        from ..checkpoint import torch_convert as TC
        ckpt = torch.load(args.pretrain_path, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        params, unexpected = TC.load_pretrained_swin2d(params, sd, cfg)
        print(f"loaded {args.pretrain_path}; unexpected: {len(unexpected)}")

    for flag in ("freqm", "timem", "noise", "label_smooth", "mixup",
                 "finetune_path"):
        if getattr(args, flag):
            print(f"warning: --{flag} is accepted for reference-surface "
                  "compatibility but has no effect (the reference AVS driver "
                  "parses it and never consumes it)")
    if args.loss != "IoU":
        print(f"warning: --loss {args.loss} selected, but the reference AVS "
              "train loop hardcodes IouSemanticAwareLoss "
              "(traintest_adapt_avs.py:162) — training with IoU")
    if args.dir_audio_log_mel:
        print("note: --dir_audio_log_mel set; the VGGish pkls will be loaded "
              "and returned with every batch (reference S4Dataset parity) — "
              "the Swin trainer computes log-mel from the wav on device and "
              "does not consume them")

    img = cfg.img_size
    fb = SWIN_FBANK if not args.tiny else dataclasses.replace(
        SWIN_FBANK, num_mel_bins=img)
    target_len = 224 if not args.tiny else img
    if args.target_length is not None and args.target_length != target_len:
        print(f"warning: --target_length {args.target_length} conflicts with "
              f"the tower's audio geometry ({target_len} frames for this "
              "preset); keeping the preset")

    if args.synthetic:
        tr_ds = SyntheticAVS(4, args.num_frames, img, split="train")
        te_ds = SyntheticAVS(2, args.num_frames, img, seed=99, split="test")
    else:
        # audio_log_mel loading is opt-in via the explicit flag for this
        # (Swin) trainer: the pkls are dead weight in its batches — a
        # (B,5,1,96,64) f32 host->device transfer per step the model never
        # reads (ADVICE r3). Direct AVSDataset users get auto-detection.
        dirs = dict(dir_image=args.dir_image, dir_mask=args.dir_mask,
                    dir_audio_wav=args.dir_audio_wav,
                    dir_audio_log_mel=args.dir_audio_log_mel,
                    load_audio_log_mel=bool(args.dir_audio_log_mel))
        tr_ds = AVSDataset(args.meta_csv, args.data_root, "train",
                           args.num_frames, **dirs)
        te_ds = AVSDataset(args.meta_csv, args.data_root, "test",
                           args.num_frames, **dirs)

    weights = None
    if args.bal == "bal":
        print("balanced sampler is being used")
        if not args.weight_csv:
            raise SystemExit("--bal bal requires --weight_csv (per-sample "
                             "weights, one float per line)")
        weights = np.loadtxt(args.weight_csv, delimiter=",")
    else:
        print("balanced sampler is not used")
    tr = DataLoader(tr_ds, args.batch_size, shuffle=True,
                    num_workers=args.num_workers, sample_weights=weights)
    te = DataLoader(te_ds, args.batch_size, shuffle=False, drop_last=False,
                    num_workers=args.num_workers)

    # AVS protocol: ToTensor + ImageNet Normalize only, train AND eval
    # (AVS/dataloader.py:65-72) — no RandAugment/crop; frames pre-sized 224^2
    train_pipe = make_avs_device_pipeline(fb, target_len, args.dataset_mean,
                                          args.dataset_std)
    eval_pipe = train_pipe

    def loss_fn(p, batch, rng_):
        a, v = train_pipe({"frames": batch["frames"], "wave": batch["wave"]}, rng_)
        # train=True: TPAVI W_z BatchNorm runs in batch-stat mode and its
        # running-stat momentum updates flow out via aux['state_updates']
        # (torch buffer semantics — AVS/model/TPAVI.py:57-63)
        pred, fmaps, afeas, bn_state = avs.apply_avs(
            p, cfg, hcfg, a, v, train=True, return_state=True)
        gt = batch["masks"][:, 0][..., None]  # first-frame mask (B,H,W,1)
        total, aux = losses.iou_semantic_aware_loss(
            pred, gt, afeas, fmaps, args.lambda_1,
            count_stages=tuple(args.tpavi_stages) if args.sa_loss else (),
            sa_loss_flag=args.sa_loss, frames_per_clip=args.num_frames)
        aux = dict(aux)
        aux["state_updates"] = {"avstask": {
            k: {"W_z": {"bn": s}} for k, s in bn_state.items()}}
        return total, aux

    @jax.jit
    def infer(p, a, v):
        pred, _, _ = avs.apply_avs(p, cfg, hcfg, a, v)
        return pred

    def eval_fn(p, loader):
        ious = []
        for batch in loader:
            a, v = eval_pipe({"frames": batch["frames"], "wave": batch["wave"]})
            pred = infer(p, a, v)[..., 0]  # (B*T, H, W)
            masks = batch["masks"]
            B = masks.shape[0]
            if masks.shape[1] == args.num_frames:  # test: all-frame masks
                gt = masks.reshape(-1, *masks.shape[2:])
                ious.append(float(losses.mask_iou(pred, jnp.asarray(gt))))
            else:
                first = pred.reshape(B, args.num_frames,
                                     *pred.shape[1:])[:, 0]
                ious.append(float(losses.mask_iou(first,
                                                  jnp.asarray(masks[:, 0]))))
            if args.save_mask_dir:
                _dump_masks(np.asarray(pred), args.save_mask_dir, len(ious))
        return {"miou": float(np.mean(ious)) if ious else float("nan")}

    if args.eval_only:
        # standalone evaluation (AVS/test.py equivalent): load ckpt, MIoU,
        # optional PNG mask dump
        if args.ckpt:
            from ..checkpoint.io import load_checkpoint
            params = load_checkpoint(args.ckpt, params)
        metrics = eval_fn(params, te)
        print("eval:", metrics)
        return metrics

    lr_mode = ("plateau" if args.lr_adapt
               else "cosine" if args.lr_cosine_adapt else "multistep")
    if args.wa and not args.save_model:
        raise SystemExit("--wa True requires --save_model True (weight "
                         "averaging reads the per-epoch checkpoints)")
    trainer = Trainer(loss_fn=loss_fn, eval_fn=eval_fn, params=params,
                      base_lr=args.lr, head_lr_mult=args.head_lr,
                      n_epochs=args.n_epochs,
                      steps_per_epoch=max(len(tr), 1),
                      warmup_epochs=args.warmup_epochs if args.warmup else 0,
                      min_lr=args.min_lr,
                      exp_dir=args.exp_dir, freeze_base=args.freeze_base,
                      save_every_epoch=args.save_model, metric_name="miou",
                      lr_mode=lr_mode, plateau_patience=args.lr_patience,
                      multistep=(args.lrscheduler_start, args.lrscheduler_step,
                                 args.lrscheduler_decay))
    trainer.fit(tr, te, rng, resume=args.resume)
    print("done. best epoch", trainer.best_epoch, "best miou", trainer.best_metric)

    if args.wa:
        # weight averaging over per-epoch ckpts (AVS/run_adapt_avs.py:243-252)
        from ..checkpoint.io import load_checkpoint
        from ..train.loop import weight_average
        like = trainer.params()
        trees = [load_checkpoint(os.path.join(args.exp_dir, "models",
                                              f"model.{e}"),
                                 jax.tree_util.tree_map(lambda x: x, like))
                 for e in range(args.wa_start,
                                min(args.wa_end, args.n_epochs) + 1)]
        rep = eval_fn(weight_average(trees), te)
        print("weight-averaged eval:", rep)
    return trainer


def _dump_masks(pred_logits, out_dir, batch_idx):
    """Save P-mode PNG masks like AVS/test.py:41-103."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    m = (1 / (1 + np.exp(-pred_logits)) > 0.5).astype(np.uint8) * 255
    for i, frame in enumerate(m):
        Image.fromarray(frame).convert("P").save(
            os.path.join(out_dir, f"batch{batch_idx}_frame{i}.png"))


if __name__ == "__main__":
    main()
