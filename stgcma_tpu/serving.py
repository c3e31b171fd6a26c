"""Multi-task batched AV serving: one frozen backbone resident in HBM, per-task
adapter/head pytrees selected per request (BASELINE.json stretch config).

The frozen tower leaves of every task's param tree are aliased to the same
device buffers (`share_frozen_tower`), so serving AVE + AVQA + AVS Large towers
costs one backbone's HBM plus the small adapter/head deltas. Each task gets a
jit-compiled inference fn; requests are dispatched by task name.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from .configs import AVQAHeadConfig, AVSHeadConfig, ClipConfig, SwinConfig
from .models import ave, avqa, avs
from .ops.common import cast_tree
from .train.optim import label_params


def share_frozen_tower(canonical: Dict[str, Any], others: Dict[str, Dict[str, Any]]):
    """Alias every 'frozen'-labeled backbone leaf of each task tree to the
    canonical tree's buffer (same jax.Array object => no extra HBM copy)."""
    canon_by_path = {jax.tree_util.keystr(p): v for p, v in
                     jax.tree_util.tree_flatten_with_path(canonical["backbone"])[0]}
    labels = label_params({"backbone": canonical["backbone"]})

    out = {}
    for name, tree in others.items():
        lab_flat = {jax.tree_util.keystr(p): l for p, l in
                    jax.tree_util.tree_flatten_with_path(labels["backbone"])[0]}

        def swap(path, leaf):
            sp = jax.tree_util.keystr(path)
            if lab_flat.get(sp) == "frozen" and sp in canon_by_path \
                    and canon_by_path[sp].shape == leaf.shape:
                return canon_by_path[sp]
            return leaf

        new_tree = dict(tree)
        new_tree["backbone"] = jax.tree_util.tree_map_with_path(
            swap, tree["backbone"])
        out[name] = new_tree
    return out


class MultiTaskServer:
    """Dispatches batched inference across AVE / AVQA / AVS heads.

    mesh: optional jax.sharding.Mesh for multi-chip serving. Request batches
    are sharded over the mesh's 'data' axis (the leading dim must divide its
    extent) and params are replicated, so pure-dp inference is
    collective-free and throughput scales ~linearly with the 'data' extent
    over ICI. shard_tower=True additionally applies the Megatron column/row
    splits over 'model' (runtime.mesh.shard_params) for Large towers that
    exceed one chip's HBM — XLA then inserts the tp collectives from the
    sharding annotations alone (SURVEY.md §2.12; no reference counterpart,
    the reference serves single-GPU only)."""

    def __init__(self, dtype=jnp.bfloat16, mesh=None, shard_tower=False):
        self.dtype = dtype
        self.mesh = mesh
        self.shard_tower = shard_tower
        self._fns: Dict[str, Callable] = {}
        self._params: Dict[str, Any] = {}

    def _place(self, params):
        if self.mesh is None:
            return params
        from .runtime import mesh as M
        return (M.shard_params(params, self.mesh) if self.shard_tower
                else M.replicate(params, self.mesh))

    def add_ave(self, name: str, cfg: SwinConfig, params):
        p = self._place(cast_tree(params, self.dtype))
        fn = jax.jit(lambda p, a, v: ave.apply_swin_ave(p, cfg, a, v))
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"])
        self._params[name] = p

    def add_clip_ave(self, name: str, cfg: ClipConfig, params):
        p = self._place(cast_tree(params, self.dtype))
        fn = jax.jit(lambda p, a, v: ave.apply_clip_ave(p, cfg, a, v))
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"])
        self._params[name] = p

    def add_avs(self, name: str, cfg: SwinConfig, hcfg: AVSHeadConfig, params):
        p = self._place(cast_tree(params, self.dtype))
        fn = jax.jit(lambda p, a, v: avs.apply_avs(p, cfg, hcfg, a, v)[0])
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"])
        self._params[name] = p

    def add_avqa(self, name: str, cfg: SwinConfig, hcfg: AVQAHeadConfig, params):
        p = self._place(cast_tree(params, self.dtype))
        fn = jax.jit(lambda p, a, v, vn, q:
                     avqa.apply_avqa(p, cfg, hcfg, a, v, vn, q)[0])
        self._fns[name] = lambda p, batch: fn(p, batch["a"], batch["v"],
                                              batch["v_nega"], batch["question"])
        self._params[name] = p

    def tasks(self):
        return sorted(self._fns)

    def predict(self, task: str, batch: Dict[str, np.ndarray]):
        batch = {k: jnp.asarray(v).astype(self.dtype)
                 if np.issubdtype(np.asarray(v).dtype, np.floating)
                 else jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            from .runtime import mesh as M
            d = self.mesh.shape["data"]
            for k, v in batch.items():
                if v.shape[0] % d:
                    raise ValueError(
                        f"batch['{k}'] leading dim {v.shape[0]} does not "
                        f"divide the mesh's data extent {d}; pad the request "
                        "micro-batch to a multiple (serve_stream does)")
            sharding = M.batch_sharding(self.mesh)
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return np.asarray(self._fns[task](self._params[task], batch),
                          dtype=np.float32)


# ---------------------------------------------------------------------------
# streaming decode serving (BASELINE.json configs[4] stretch):
# raw WAV bytes on disk + packed frames -> native host decode -> TPU-resident
# preprocess (fbank + transforms) -> MultiTaskServer.predict, with host decode
# double-buffered against device compute.
# ---------------------------------------------------------------------------

import dataclasses
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, List, Optional, Sequence, Tuple


@dataclasses.dataclass
class StreamRequest:
    """One serving request: a clip's audio file + frames.

    Frames come in ONE of two forms:
      - frames: (T, H, W, 3) uint8 (already decoded on a client/edge tier);
      - frame_paths: T jpg/png paths, decoded server-side by HostDecoder's
        native multithreaded decoder (native/stgcma_host.cc) at the
        decoder's staging geometry — the full raw-bytes-to-logits ingest
        path. When a frame's native size equals the staging size the decode
        is bit-exact vs PIL; otherwise the host applies a PIL-parity
        antialiased bilinear resize (the TPU pipeline still performs the
        protocol resize/crop from the staged frames).
    extras: per-task tensors merged into the model batch (e.g. AVQA
    'question' token ids)."""
    task: str
    wav_path: str
    frames: Optional[np.ndarray] = None
    extras: Optional[Dict[str, np.ndarray]] = None
    rid: int = 0
    frame_paths: Optional[Sequence[str]] = None


class HostDecoder:
    """Host-side stage: multithreaded native WAV decode (scipy fallback) into
    (B, num_segments, seg_samples) float32 segment tensors + packed frames."""

    def __init__(self, num_segments: int = 10, seg_samples: int = 16000,
                 num_threads: int = 8, frame_hw: Tuple[int, int] = (256, 256)):
        self.num_segments = num_segments
        self.seg_samples = seg_samples
        self.num_threads = num_threads
        self.frame_hw = frame_hw    # staging geometry for frame_paths decode
        from .data import native_io
        self._native = native_io.available()

    def _decode_python(self, paths: Sequence[str]) -> np.ndarray:
        from .data.datasets import load_wav
        from .ops.fbank import segment_starts
        out = np.zeros((len(paths), self.num_segments, self.seg_samples),
                       np.float32)
        for i, p in enumerate(paths):
            try:
                wav, sr = load_wav(p)   # (C, L) torchaudio layout
            except Exception:
                continue
            wav = wav.mean(axis=0)      # mono downmix
            starts = segment_starts(len(wav), self.seg_samples,
                                    self.num_segments, sample_rate=sr)
            for s, st in enumerate(starts):
                seg = wav[st:st + self.seg_samples]
                out[i, s, :len(seg)] = seg
        return out

    def _decode_frames(self, reqs: Sequence[StreamRequest]) -> np.ndarray:
        """Per-request frames: pass through pre-decoded arrays, batch-decode
        jpg/png paths natively (PIL fallback) at the staging geometry."""
        from .data import native_io
        H, W = self.frame_hw
        path_reqs = [r for r in reqs if r.frame_paths is not None]
        decoded: Dict[int, np.ndarray] = {}
        if path_reqs:
            flat = [p for r in path_reqs for p in r.frame_paths]
            if native_io.image_available():
                imgs, _ok = native_io.decode_image_batch(
                    flat, H, W, num_threads=self.num_threads)
            else:
                from PIL import Image
                imgs = np.zeros((len(flat), H, W, 3), np.uint8)
                for i, p in enumerate(flat):
                    with Image.open(p) as im:
                        imgs[i] = np.asarray(
                            im.convert("RGB").resize((W, H), Image.BILINEAR),
                            np.uint8)
            ofs = 0
            for r in path_reqs:
                decoded[id(r)] = imgs[ofs:ofs + len(r.frame_paths)]
                ofs += len(r.frame_paths)
        out = []
        for r in reqs:
            if r.frame_paths is not None:
                out.append(decoded[id(r)])
            elif r.frames is not None:
                out.append(r.frames)
            else:
                raise ValueError(
                    f"request rid={r.rid}: neither frames nor frame_paths set")
        return np.stack(out)

    def __call__(self, reqs: Sequence[StreamRequest]) -> Dict[str, np.ndarray]:
        paths = [r.wav_path for r in reqs]
        if self._native:
            from .data import native_io
            wave, _ok = native_io.decode_wav_batch(
                paths, self.num_segments, self.seg_samples,
                num_threads=self.num_threads)
        else:
            wave = self._decode_python(paths)
        batch = {"wave": wave,
                 "frames": self._decode_frames(reqs)}
        extras = [r.extras for r in reqs if r.extras]
        if extras:
            if len(extras) != len(reqs) or any(
                    set(e) != set(extras[0]) for e in extras[1:]):
                raise ValueError(
                    "heterogeneous extras within a micro-batch: every request "
                    "must carry the same extra tensors (e.g. AVQA question "
                    "ids) or none")
            for k in extras[0]:
                batch[k] = np.stack([r.extras[k] for r in reqs])
        return batch


def video_requests(task: str, items, num_frames: int = 10,
                   frame_hw: Tuple[int, int] = (256, 256),
                   start_rid: int = 0):
    """Yield StreamRequests by decoding VIDEO CONTAINERS (mp4/avi/mkv —
    OpenCV/FFMPEG backend) host-side: the reference serves only from
    offline-extracted frame dirs (AVE/dataloader.py), so this closes the raw
    corpus-file -> logits chain without a preprocessing pass.

    items: iterable of (video_path, wav_path) or (video_path, wav_path,
    extras). Sampling mirrors the offline grid (preprocess_s4.py:24-102 /
    tools/preprocess_avs.py): one frame per second at the half-second mark,
    clamped to the last frame, staged at `frame_hw` (the TPU pipeline still
    applies the protocol resize/crop downstream)."""
    import cv2

    for i, item in enumerate(items):
        video_path, wav_path = item[0], item[1]
        extras = item[2] if len(item) > 2 else None
        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            raise ValueError(f"cannot open video container: {video_path}")
        fps = cap.get(cv2.CAP_PROP_FPS) or 16.0
        raw = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            raw.append(f)
        cap.release()
        if not raw:
            raise ValueError(f"no frames decoded from {video_path}")
        H, W = frame_hw
        frames = np.empty((num_frames, H, W, 3), np.uint8)
        for s in range(num_frames):
            idx = min(int(round((s + 0.5) * fps)), len(raw) - 1)
            frames[s] = cv2.resize(raw[idx], (W, H),
                                   interpolation=cv2.INTER_LINEAR)[:, :, ::-1]
        yield StreamRequest(task=task, wav_path=wav_path, frames=frames,
                            extras=extras, rid=start_rid + i)


def serve_stream(server: MultiTaskServer,
                 pipelines: Dict[str, Callable],
                 requests: Iterable[StreamRequest],
                 batch_size: int = 8,
                 decoder: Optional[HostDecoder] = None,
                 decode_depth: int = 2
                 ) -> Iterable[Tuple[List[int], np.ndarray]]:
    """Stream requests through decode -> device preprocess -> model.

    pipelines: task -> fn(host_batch) -> model batch ({'a','v',...}); use
    data.loader.make_ave_device_pipeline for the AVE towers. Host decode for
    batch i+1..i+decode_depth overlaps device compute for batch i (JAX
    dispatch is async; the ThreadPoolExecutor keeps the native decoder busy).
    Yields (request ids, outputs) per micro-batch, preserving per-task
    arrival order. The final partial batch per task is padded to batch_size
    and the padding rows are dropped from the output.
    """
    decoder = decoder or HostDecoder()
    ex = ThreadPoolExecutor(max_workers=decode_depth)

    def micro_batches():
        groups: Dict[str, List[StreamRequest]] = {}
        for r in requests:
            groups.setdefault(r.task, []).append(r)
            if len(groups[r.task]) == batch_size:
                yield groups.pop(r.task)
        for task in sorted(groups):
            yield groups[task]

    def run(mb, fut):
        host = fut.result()
        n = len(mb)
        if n < batch_size:           # pad tail batch to the compiled shape
            pad = batch_size - n
            host = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in host.items()}
        model_batch = pipelines[mb[0].task](host)
        out = server.predict(mb[0].task, model_batch)
        # leading axis may be per-request or per-frame (AVE: B*T rows)
        if out.shape[0] % len(host["frames"]) != 0:
            raise ValueError(
                f"model output leading dim {out.shape[0]} is not a multiple "
                f"of the padded batch {len(host['frames'])}; cannot slice "
                "per-request results")
        rows_per_req = out.shape[0] // len(host["frames"])
        return [r.rid for r in mb], out[:n * rows_per_req]

    pending: deque = deque()
    try:
        for mb in micro_batches():
            pending.append((mb, ex.submit(decoder, mb)))
            if len(pending) > decode_depth:
                mb0, fut0 = pending.popleft()
                yield run(mb0, fut0)
        while pending:
            mb0, fut0 = pending.popleft()
            yield run(mb0, fut0)
    finally:
        ex.shutdown(wait=False)
