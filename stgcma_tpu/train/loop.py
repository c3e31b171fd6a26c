"""Generic training loop: epoch/batch iteration, per-step LR table, validation,
per-epoch + best checkpointing, weight averaging, NaN divergence guard,
result.csv / progress bookkeeping, step-time meters.

Mirrors the reference engine (AVE/traintest_adapt_ave29.py:14-257) minus the
DataParallel machinery (replaced by SPMD sharding) and adds mid-training resume
(absent in the reference — SURVEY §5).
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..checkpoint.io import save_checkpoint
from ..checkpoint.torch_convert import average_params
from ..metrics.stats import AverageMeter
from . import optim as O
from . import steps as S


def _deep_update(dst, src):
    """Merge a partial param subtree (e.g. BN running-stat updates) into a
    full pytree, replacing only the leaves present in `src`."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


class Trainer:
    def __init__(self, *, loss_fn, eval_fn, params, base_lr: float,
                 head_lr_mult: float = 1.0, weight_decay: float = 5e-7,
                 n_epochs: int = 10, steps_per_epoch: int = 100,
                 warmup_epochs: int = 0, min_lr: float = 1e-7,
                 exp_dir: str = "./exp", freeze_base: bool = True,
                 compute_dtype=jnp.bfloat16, mesh=None, metric_name: str = "acc",
                 save_every_epoch: bool = True, lr_mode: str = "cosine",
                 plateau_patience: int = 2, plateau_factor: float = 0.5,
                 multistep=(10, 5, 0.5)):
        """lr_mode mirrors the reference scheduler selection
        (AVE/traintest_adapt_ave29.py:79-107): 'cosine' (lr_cosine_adapt,
        the launch-config default), 'plateau' (lr_adapt -> ReduceLROnPlateau
        mode=max factor=0.5), 'multistep' (the final fallback;
        multistep=(start, step, decay))."""
        self.exp_dir = exp_dir
        os.makedirs(os.path.join(exp_dir, "models"), exist_ok=True)
        # the head group gets its OWN table built from base lr*head_lr (the
        # reference builds two cosine tables with the same min_lr floor,
        # AVE/traintest_adapt_ave29.py:84-101 — a shared-table multiplier
        # diverges near the floor)
        if lr_mode == "cosine":
            lr_table = O.cosine_schedule(base_lr, min_lr, n_epochs,
                                         steps_per_epoch, warmup_epochs)
            head_table = O.cosine_schedule(base_lr * head_lr_mult, min_lr,
                                           n_epochs, steps_per_epoch,
                                           warmup_epochs)
        elif lr_mode == "multistep":
            lr_table = O.multistep_schedule(base_lr, multistep[0], multistep[1],
                                            multistep[2], n_epochs,
                                            steps_per_epoch)
            head_table = O.multistep_schedule(
                base_lr * head_lr_mult, multistep[0], multistep[1],
                multistep[2], n_epochs, steps_per_epoch)
        elif lr_mode == "plateau":
            lr_table = np.full(n_epochs * steps_per_epoch, base_lr, np.float32)
            head_table = np.full(n_epochs * steps_per_epoch,
                                 base_lr * head_lr_mult, np.float32)
        else:
            raise ValueError(f"unknown lr_mode {lr_mode}")
        self.lr_mode = lr_mode
        self.lr_table = lr_table
        self.head_lr_table = head_table
        self.plateau_patience = plateau_patience
        self.plateau_factor = plateau_factor
        self._plateau_bad = 0
        self._plateau_best = -np.inf
        self._opt_args = dict(base_lr=base_lr, head_lr_mult=head_lr_mult,
                              weight_decay=weight_decay)
        self._loss_fn = loss_fn
        self._compute_dtype = compute_dtype
        self.tx = O.build_optimizer(params, base_lr, head_lr_mult, weight_decay,
                                    lr_table=lr_table, head_lr_table=head_table)
        self.train_p, self.frozen_p, self.opt_state, self.mask = \
            S.init_train_state(params, self.tx, freeze_base)
        if mesh is not None:
            from ..runtime import mesh as M
            self.frozen_p = M.shard_params(self.frozen_p, mesh)
            self.train_p = M.replicate(self.train_p, mesh)
            self.opt_state = M.replicate(self.opt_state, mesh)
        self.mesh = mesh
        self.step_fn = S.make_train_step(loss_fn, self.tx,
                                         compute_dtype=compute_dtype)
        self.eval_fn = eval_fn
        self.n_epochs = n_epochs
        self.metric_name = metric_name
        self.save_every_epoch = save_every_epoch
        self.history = []
        self.best_metric = -np.inf
        self.best_epoch = 0
        self.global_step = 0

    def params(self):
        return O.merge_params(self.train_p, self.frozen_p)

    def _maybe_plateau(self, metric: float):
        """ReduceLROnPlateau(mode='max', factor, patience) — halve the LR
        table when `metric` fails to improve for `patience` epochs. The Adam
        moments survive; only the lr closure (and its jit) rebuilds."""
        if self.lr_mode != "plateau":
            return
        # torch is_better, mode='max', threshold_mode='rel', threshold=1e-4:
        # a > best * (1 + threshold)
        if metric > self._plateau_best * (1.0 + 1e-4):
            self._plateau_best = metric
            self._plateau_bad = 0
            return
        self._plateau_bad += 1
        if self._plateau_bad > self.plateau_patience:
            self._plateau_bad = 0
            # torch ReduceLROnPlateau multiplies EVERY param group's lr
            self.lr_table = self.lr_table * self.plateau_factor
            self.head_lr_table = self.head_lr_table * self.plateau_factor
            print(f"plateau: reducing lr to {self.lr_table[0]:.3e}")
            self.tx = O.build_optimizer(None, lr_table=self.lr_table,
                                        head_lr_table=self.head_lr_table,
                                        **self._opt_args)
            self.step_fn = S.make_train_step(self._loss_fn, self.tx,
                                             compute_dtype=self._compute_dtype)

    def train_epoch(self, epoch: int, batches: Iterable, rng) -> float:
        loss_meter, time_meter = AverageMeter(), AverageMeter()
        for batch in batches:
            t0 = time.time()
            if isinstance(batch, dict):
                # drop non-array fields (e.g. AVQA qtype strings) before jit
                batch = {k: v for k, v in batch.items()
                         if hasattr(v, "dtype") or
                         (isinstance(v, np.ndarray))}
            if self.mesh is not None:
                from ..runtime import mesh as M
                batch = M.shard_batch(batch, self.mesh)
            rng, sub = jax.random.split(rng)
            self.train_p, self.opt_state, loss, aux = self.step_fn(
                self.train_p, self.frozen_p, self.opt_state, batch, sub)
            if isinstance(aux, dict) and aux.get("state_updates"):
                # mutable forward state (TPAVI BatchNorm running stats —
                # torch buffer semantics): deep-merge into the frozen tree
                self.frozen_p = _deep_update(self.frozen_p,
                                             aux["state_updates"])
            loss_meter.update(float(loss))
            time_meter.update(time.time() - t0)
            self.global_step += 1
            # divergence guard (AVE/traintest_adapt_ave29.py:187-189)
            if np.isnan(loss_meter.avg):
                print("training diverged — NaN loss; stopping epoch")
                return float("nan")
        print(f"epoch {epoch}: loss {loss_meter.avg:.4f} "
              f"({time_meter.avg*1000:.0f} ms/step)")
        return loss_meter.avg

    def validate(self, batches: Iterable) -> Dict[str, float]:
        return self.eval_fn(self.params(), batches)

    # ---- mid-training resume (absent in the reference — SURVEY §5) ----

    def _state_dir(self):
        return os.path.join(self.exp_dir, "state")

    def save_state(self, epoch: int):
        save_checkpoint(self._state_dir(),
                        {"train_params": self.train_params_tree(),
                         "opt_state": self.opt_state})
        with open(os.path.join(self.exp_dir, "state_meta.json"), "w") as f:
            json.dump({"epoch": epoch, "history": self.history,
                       "best_metric": float(self.best_metric),
                       "best_epoch": self.best_epoch,
                       "global_step": self.global_step}, f)

    def train_params_tree(self):
        return self.train_p

    def try_restore(self) -> int:
        """Returns the epoch to start from (1 if no state saved)."""
        meta_path = os.path.join(self.exp_dir, "state_meta.json")
        if not os.path.exists(meta_path):
            return 1
        from ..checkpoint.io import load_checkpoint
        like = {"train_params": self.train_p, "opt_state": self.opt_state}
        state = load_checkpoint(self._state_dir(), like)
        self.train_p = state["train_params"]
        self.opt_state = state["opt_state"]
        with open(meta_path) as f:
            meta = json.load(f)
        self.history = meta["history"]
        self.best_metric = meta["best_metric"]
        self.best_epoch = meta["best_epoch"]
        self.global_step = meta.get("global_step", 0)
        print(f"resumed from epoch {meta['epoch']}")
        return meta["epoch"] + 1

    def fit(self, train_loader, val_loader, rng=None, resume: bool = False):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        start = self.try_restore() if resume else 1
        for epoch in range(start, self.n_epochs + 1):
            loss = self.train_epoch(epoch, train_loader, jax.random.fold_in(rng, epoch))
            if np.isnan(loss):
                break
            metrics = self.validate(val_loader) if val_loader is not None else {}
            stats = metrics.pop("_stats", None)
            if stats is not None:
                # per-epoch full-stats archive (AVE/traintest_adapt_ave29.py:243-244)
                import pickle
                with open(os.path.join(self.exp_dir,
                                       f"stats_{epoch}.pickle"), "wb") as f:
                    pickle.dump(stats, f, protocol=pickle.HIGHEST_PROTOCOL)
            metric = metrics.get(self.metric_name, -loss)
            self._maybe_plateau(metric)
            self.history.append({"epoch": epoch, "loss": loss, **metrics})
            self._write_results()
            if self.save_every_epoch:
                save_checkpoint(os.path.join(self.exp_dir, "models",
                                             f"model.{epoch}"), self.params())
            if metric > self.best_metric:
                self.best_metric, self.best_epoch = metric, epoch
                save_checkpoint(os.path.join(self.exp_dir, "models", "best_model"),
                                self.params())
            self.save_state(epoch)
        return self.history

    def _write_results(self):
        path = os.path.join(self.exp_dir, "result.csv")
        # fixed column order (union of keys, epoch/loss first) + header row —
        # dict-order rows were fragile when metrics differ across epochs
        cols = ["epoch", "loss"]
        for row in self.history:
            for k in row:
                if k not in cols:
                    cols.append(k)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for row in self.history:
                w.writerow([row.get(k, "") for k in cols])
        with open(os.path.join(self.exp_dir, "progress.json"), "w") as f:
            json.dump({"history": self.history, "best_epoch": self.best_epoch,
                       "best_metric": float(self.best_metric)}, f)


def weight_average(param_trees):
    """Post-train epoch-checkpoint averaging (AVE/run_adapt_ave29.py:203-214)."""
    return average_params(param_trees)
