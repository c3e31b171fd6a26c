"""Batching + background prefetch + on-device finishing pipeline.

Replaces torch DataLoader workers (process boundary #1 in SURVEY §3.1) with a
thread-pool decode feeding a jit device pipeline: host does IO/decode only;
fbank + augmentation + normalization run on TPU in one fused program.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fbank import SWIN_FBANK, CLIP_FBANK, FbankConfig, fbank_image
from . import transforms


def collate(items):
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) \
                or isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # e.g. qtype strings
    return out


class DataLoader:
    """Minimal prefetching loader: parallel __getitem__ decode, FIFO batches.

    sample_weights: per-item weights for balanced sampling — each epoch draws
    len(weights) indices WITH replacement, p proportional to weight (torch
    WeightedRandomSampler semantics, AVE/run_adapt_ave29.py:101-111)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = True, seed: int = 0,
                 prefetch: int = 2, sample_weights=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        if sample_weights is not None:
            sample_weights = np.asarray(sample_weights, np.float64)
            assert len(sample_weights) == len(dataset), \
                "sample_weights must have one entry per dataset item"
        self.sample_weights = sample_weights

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.sample_weights is not None:
            rs = np.random.RandomState(self.seed + self.epoch)
            p = self.sample_weights / self.sample_weights.sum()
            idx = rs.choice(len(self.dataset), size=len(self.dataset),
                            replace=True, p=p)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 0:
            # torch-DataLoader num_workers=0 semantics: load inline
            for b in batches:
                yield collate([self.dataset[j] for j in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        stop = threading.Event()

        def produce():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, b))
                    q.put(collate(items))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False)


def make_ave_device_pipeline(fbank_cfg: FbankConfig = SWIN_FBANK,
                             target_length: int = 224,
                             norm_mean: float = -5.081, norm_std: float = 4.485,
                             train: bool = False, image_size: int = 224,
                             mixup: float = 0.0):
    """jit: raw uint8 frames + wave segments -> model-ready (a, v) tensors.
    Default fbank norm stats follow the reference launch-script values
    (AVE/run_swin_adapt_ave29.sh dataset_mean/std flags). mixup > 0 enables
    the reference's waveform mixup (AVE/dataloader.py:491-497) on the train
    path — audio only, per-second Beta(10,10) lambdas."""

    @jax.jit
    def eval_pipe(batch):
        v = jax.vmap(lambda c: transforms.eval_transform(c, image_size))(
            batch["frames"])
        a = fbank_image(batch["wave"], fbank_cfg, target_length,
                        norm_mean, norm_std)
        return a, v

    @jax.jit
    def train_pipe(batch, rng):
        B = batch["frames"].shape[0]
        k_mix, k_aug = jax.random.split(rng)
        rngs = jax.random.split(k_aug, B)
        v = jax.vmap(lambda r, c: transforms.train_transform(r, c, image_size))(
            rngs, batch["frames"])
        wave = batch["wave"]
        if mixup > 0:
            wave = transforms.mixup_batch(k_mix, wave, mixup_prob=mixup)
        a = fbank_image(wave, fbank_cfg, target_length,
                        norm_mean, norm_std)
        return a, v

    return train_pipe if train else eval_pipe


def make_avqa_device_pipeline(fbank_cfg: FbankConfig = SWIN_FBANK,
                              target_length: int = 224,
                              norm_mean: float = -5.385, norm_std: float = 3.593,
                              image_size: int = 224):
    """AVQA device pipeline: the reference protocol is IDENTICAL for train and
    eval — direct 224x224 BICUBIC resize + ImageNet normalize, no augmentation
    (AVQA/dataloader.py:86-90). The optional rng argument is accepted and
    ignored so the CLI can call it uniformly with the AVE train pipe."""

    @jax.jit
    def pipe(batch, rng=None):  # noqa: ARG001 — protocol has no randomness
        v = jax.vmap(lambda c: transforms.avqa_transform(c, image_size))(
            batch["frames"])
        a = fbank_image(batch["wave"], fbank_cfg, target_length,
                        norm_mean, norm_std)
        return a, v

    return pipe


def make_avs_device_pipeline(fbank_cfg: FbankConfig = SWIN_FBANK,
                             target_length: int = 224,
                             norm_mean: float = -5.670, norm_std: float = 3.948):
    """AVS device pipeline: ToTensor + ImageNet Normalize only, train and eval
    (AVS/dataloader.py:65-72) — frames are pre-sized by the offline
    preprocess. rng accepted and ignored (no augmentation in the protocol)."""

    @jax.jit
    def pipe(batch, rng=None):  # noqa: ARG001
        v = jax.vmap(transforms.avs_transform)(batch["frames"])
        a = fbank_image(batch["wave"], fbank_cfg, target_length,
                        norm_mean, norm_std)
        return a, v

    return pipe
