"""MUSIC-AVQA experiment driver (reference entry point: AVQA/run_adapt_avqa.py,
runnable branch MM-Swin-AVQA-Large only — SURVEY §1 note).

Loss: CE(out_qa) + 0.5*CE(out_match) (AVQA/traintest_adapt_avqa.py:172-179);
eval: overall + 9 question-type accuracies (:289-373).
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVQAHeadConfig, swin_large, swin_tiny_test
from ..data.datasets import AVQADataset
from ..data.loader import DataLoader, make_avqa_device_pipeline
from ..metrics.stats import avqa_type_accuracy
from ..models import avqa
from ..ops.fbank import SWIN_FBANK
from ..train import losses
from ..train.loop import Trainer
from .common import archive_args, seed_everything, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MM-Swin-AVQA-Large")
    p.add_argument("--ftmode", default="fusion",
                   choices=["videoonly", "audioonly", "multimodal", "fusion"])
    p.add_argument("--dataset", default="music-avqa")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--head_lr", type=float, default=0.1)
    p.add_argument("--min_lr", type=float, default=1e-7)
    p.add_argument("--warmup_epochs", type=int, default=1)
    p.add_argument("--warmup", type=str2bool, default=True)
    p.add_argument("--n-epochs", "--n_epochs", dest="n_epochs", type=int, default=15)
    p.add_argument("--batch_size", "--batch-size", dest="batch_size",
                   type=int, default=2)
    p.add_argument("--num_frames", type=int, default=10)
    p.add_argument("--adapter_ratios", type=float, nargs="*", default=None)
    p.add_argument("--exp-dir", "--exp_dir", dest="exp_dir", default="./exp/avqa")
    p.add_argument("--pretrain_path", default="")
    p.add_argument("--grounding_pretrained", default="")
    p.add_argument("--freeze_base", type=str2bool, default=True)
    p.add_argument("--loss", default="CE", choices=["CE", "BCE"])
    p.add_argument("--metrics", default="acc", choices=["acc", "mAP"])
    # weight averaging over per-epoch ckpts (run_adapt_avqa.py:395-414)
    p.add_argument("--wa", type=str2bool, default=False)
    p.add_argument("--wa_start", type=int, default=1)
    p.add_argument("--wa_end", type=int, default=5)
    # scheduler selection (traintest_adapt_avqa.py — same precedence as AVE)
    p.add_argument("--lr_adapt", type=str2bool, default=False)
    p.add_argument("--lr_patience", type=int, default=2)
    p.add_argument("--lr_cosine_adapt", type=str2bool, default=True)
    p.add_argument("--lrscheduler_start", type=int, default=10)
    p.add_argument("--lrscheduler_step", type=int, default=5)
    p.add_argument("--lrscheduler_decay", type=float, default=0.5)
    # balanced sampler (run_adapt_avqa.py:128-137)
    p.add_argument("--bal", default="none")
    p.add_argument("--weight_file", default=None)
    p.add_argument("--weight_csv", default="")
    p.add_argument("--save_model", type=str2bool, default=True)
    # reference data flags: --data_train/--data_val are the question jsons,
    # --dir_image/--dir_audio_wav the media roots (run_adapt_avqa.py:139-158)
    p.add_argument("--train_json", "--data_train", dest="train_json", default="")
    p.add_argument("--val_json", "--data_val", dest="val_json", default="")
    p.add_argument("--frames_root", "--dir_image", dest="frames_root", default="")
    p.add_argument("--audio_root", "--dir_audio_wav", dest="audio_root",
                   default="")
    p.add_argument("--num_workers", "--num-workers", dest="num_workers",
                   type=int, default=8)
    p.add_argument("--dataset_mean", type=float, default=-5.269)
    p.add_argument("--dataset_std", type=float, default=4.578)
    p.add_argument("--target_length", type=int, default=None)
    # parsed-but-inert in the reference AVQA driver (the audio_conf blocks
    # consuming them are commented out, run_adapt_avqa.py:111-128;
    # finetune_path has no reader) — accepted and warned about
    p.add_argument("--freqm", type=int, default=0)
    p.add_argument("--timem", type=int, default=0)
    p.add_argument("--noise", type=str2bool, default=False)
    p.add_argument("--label_smooth", type=float, default=0.0)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--finetune_path", default="")
    p.add_argument("--eval_only", type=str2bool, default=False)
    p.add_argument("--ckpt", default="")
    p.add_argument("--synthetic", type=str2bool, default=False)
    p.add_argument("--tiny", type=str2bool, default=False)
    # mid-training resume (beyond the reference — SURVEY §5 gap; restores
    # train params + opt state + LR position from exp_dir/state)
    p.add_argument("--resume", type=str2bool, default=False)
    return p.parse_args(argv)


class SyntheticAVQA:
    def __init__(self, n=4, num_frames=10, size=224, seed=0):
        self.n, self.T, self.size, self.seed = n, num_frames, size, seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        return {
            "frames": rng.randint(0, 256, (self.T, self.size, self.size, 3),
                                  np.uint8),
            "frames_nega": rng.randint(0, 256, (self.T, self.size, self.size, 3),
                                       np.uint8),
            "wave": (rng.randn(self.T, 31200) * 0.1).astype(np.float32),
            "question": rng.randint(0, 93, (14,)).astype(np.int32),
            "answer": np.int32(rng.randint(0, 42)),
            "qtype": ["Audio", "Counting"],
        }


def main(argv=None):
    args = parse_args(argv)
    # multi-host bring-up (no-op unless STGCMA_COORDINATOR/_DISTRIBUTED set)
    from ..runtime.mesh import init_distributed
    init_distributed()
    if args.ftmode != "fusion":
        # the reference AVQA model's videoonly/audioonly/multimodal branches
        # are vestigial AVE-style mlp_head classification paths that the AVQA
        # training loop cannot consume (loss expects the fusion outputs) — the
        # flag is kept for reference-surface compatibility but only fusion is
        # runnable (same as the reference launch scripts)
        raise SystemExit(f"--ftmode {args.ftmode} is not a runnable AVQA "
                         "mode: the reference branch returns an AVE-style "
                         "classification head output the AVQA loss cannot "
                         "consume; use --ftmode fusion")
    rng = seed_everything(0)
    archive_args(args, args.exp_dir)

    for flag in ("freqm", "timem", "noise", "label_smooth", "mixup",
                 "finetune_path"):
        if getattr(args, flag):
            print(f"warning: --{flag} is accepted for reference-surface "
                  "compatibility but has no effect (the reference AVQA "
                  "driver parses it and never consumes it — the audio_conf "
                  "blocks are commented out)")
    if args.metrics == "mAP":
        print("warning: --metrics mAP has no AVQA semantics (single-label "
              "answers); accuracy is reported")

    if args.tiny:
        cfg = swin_tiny_test(ftmode=args.ftmode, num_frames=args.num_frames)
        hcfg = AVQAHeadConfig(feat_dim=cfg.num_features, grid=7,
                              num_frames=args.num_frames)
    else:
        cfg = swin_large(ftmode=args.ftmode, num_frames=args.num_frames,
                         **({"adapter_ratios": tuple(args.adapter_ratios)}
                            if args.adapter_ratios else {}))
        hcfg = AVQAHeadConfig(feat_dim=cfg.num_features, grid=7,
                              num_frames=args.num_frames)
    params = avqa.init_avqa(jax.random.PRNGKey(0), cfg, hcfg)

    if args.pretrain_path:
        import torch
        from ..checkpoint import torch_convert as TC
        ckpt = torch.load(args.pretrain_path, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        # grounding-checkpoint splice (Swin_AVQAModel_V1.py:1520-1540)
        if args.grounding_pretrained:
            g = torch.load(args.grounding_pretrained, map_location="cpu",
                           weights_only=False)
            keep = ["fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4"]
            for k, v in g.items():
                name = k.replace("module.", "")
                if name.split(".")[0] in keep:
                    sd["avqatask_" + name] = v
        params, unexpected = TC.load_pretrained_swin2d(params, sd, cfg)
        print(f"loaded {args.pretrain_path}; unexpected: {len(unexpected)}")
    elif args.grounding_pretrained:
        # standalone grounding splice (no backbone ckpt): consume the
        # tools.grounding_gen export (reference 'module.fc_*' layout) and
        # copy matching-shaped head linears, like the reference's filtered
        # load_state_dict (Swin_AVQAModel_V1.py:1520-1540)
        import torch
        g = torch.load(args.grounding_pretrained, map_location="cpu",
                       weights_only=False)
        spliced = []
        for k, v in g.items():
            name = k.replace("module.", "")
            root, leaf = name.split(".")[0], name.split(".")[-1]
            if root not in params["avqatask"]:
                continue
            key = "kernel" if leaf == "weight" else "bias"
            arr = v.numpy().T if key == "kernel" else v.numpy()
            if params["avqatask"][root][key].shape == arr.shape:
                params["avqatask"][root][key] = jnp.asarray(arr)
                spliced.append(name)
        print(f"grounding splice: {len(spliced)} tensors "
              f"({sorted(set(n.split('.')[0] for n in spliced))})")

    img = cfg.img_size
    fb = SWIN_FBANK if not args.tiny else dataclasses.replace(
        SWIN_FBANK, num_mel_bins=img)
    target_len = 224 if not args.tiny else img
    if args.target_length is not None and args.target_length != target_len:
        print(f"warning: --target_length {args.target_length} conflicts with "
              f"the tower's audio geometry ({target_len} frames for this "
              "preset); keeping the preset (the reference AVQA driver's "
              "target_length is inert — commented-out audio_conf)")

    if args.synthetic:
        tr_ds = SyntheticAVQA(4, args.num_frames, img)
        te_ds = SyntheticAVQA(2, args.num_frames, img, seed=77)
    else:
        tr_ds = AVQADataset(args.train_json, args.train_json, args.frames_root,
                            args.audio_root, args.num_frames, "train")
        te_ds = AVQADataset(args.val_json, args.train_json, args.frames_root,
                            args.audio_root, args.num_frames, "eval")
    weights = None
    if args.bal == "bal":
        print("balanced sampler is being used")
        wpath = args.weight_csv or (
            args.train_json[:-5] + "_weight.csv" if args.train_json else "")
        if not wpath or not os.path.exists(wpath):
            raise SystemExit("--bal bal needs --weight_csv or a "
                             "<data_train>_weight.csv next to the train json "
                             "(run_adapt_avqa.py:128-137)")
        weights = np.loadtxt(wpath, delimiter=",")
    else:
        print("balanced sampler is not used")
    tr = DataLoader(tr_ds, args.batch_size, shuffle=True,
                    num_workers=args.num_workers, sample_weights=weights)
    te = DataLoader(te_ds, args.batch_size, shuffle=False, drop_last=False,
                    num_workers=args.num_workers)

    # AVQA protocol: identical train/eval preprocess (direct 224^2 BICUBIC
    # resize + ImageNet normalize, no augmentation — AVQA/dataloader.py:86-90)
    train_pipe = make_avqa_device_pipeline(fb, target_len, args.dataset_mean,
                                           args.dataset_std, image_size=img)
    eval_pipe = train_pipe

    def loss_fn(p, batch, rng_):
        k1, k2, k3 = jax.random.split(rng_, 3)
        a, v = train_pipe({"frames": batch["frames"], "wave": batch["wave"]}, k1)
        _, vn = train_pipe({"frames": batch["frames_nega"],
                            "wave": batch["wave"]}, k2)
        out_qa, m_pos, m_neg = avqa.apply_avqa(p, cfg, hcfg, a, v, vn,
                                               batch["question"],
                                               train=True, dropout_rng=k3)
        total, aux = losses.avqa_loss(out_qa, m_pos, m_neg, batch["answer"],
                                      kind=args.loss)
        return total, aux

    @jax.jit
    def infer(p, a, v, vn, q):
        return avqa.apply_avqa(p, cfg, hcfg, a, v, vn, q)[0]

    def eval_fn(p, loader):
        preds, answers, types = [], [], []
        for batch in loader:
            a, v = eval_pipe({"frames": batch["frames"], "wave": batch["wave"]})
            _, vn = eval_pipe({"frames": batch["frames_nega"],
                               "wave": batch["wave"]})
            out_qa = infer(p, a, v, vn, jnp.asarray(batch["question"]))
            preds.extend(np.argmax(np.asarray(out_qa), -1).tolist())
            answers.extend(np.asarray(batch["answer"]).tolist())
            types.extend(batch["qtype"])
        rep = avqa_type_accuracy(preds, answers, types)
        return {"acc": rep["Overall"], **{k: v for k, v in rep.items()}}

    if args.eval_only:
        # standalone per-question-type evaluation (AVQA/test.py equivalent)
        if args.ckpt:
            from ..checkpoint.io import load_checkpoint
            params = load_checkpoint(args.ckpt, params)
        rep = eval_fn(params, te)
        for k, v in rep.items():
            print(f"{k}: {v}")
        return rep

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
                      save_every_epoch=args.save_model, metric_name="acc",
                      lr_mode=lr_mode, plateau_patience=args.lr_patience,
                      multistep=(args.lrscheduler_start, args.lrscheduler_step,
                                 args.lrscheduler_decay))
    trainer.fit(tr, te, rng, resume=args.resume)
    print("done. best epoch", trainer.best_epoch, "best acc", trainer.best_metric)

    if args.wa:
        # weight averaging over per-epoch checkpoints
        # (AVQA/run_adapt_avqa.py:395-414)
        from ..checkpoint.io import load_checkpoint
        from ..train.loop import weight_average
        like = trainer.params()
        trees = [load_checkpoint(os.path.join(args.exp_dir, "models",
                                              f"model.{e}"),
                                 jax.tree_util.tree_map(lambda x: x, like))
                 for e in range(args.wa_start,
                                min(args.wa_end, args.n_epochs) + 1)]
        avg = weight_average(trees)
        rep = eval_fn(avg, te)
        print("weight-averaged eval:", {k: rep[k] for k in ("acc",)
                                        if k in rep})
    return trainer


if __name__ == "__main__":
    main()
