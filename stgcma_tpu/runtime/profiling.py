"""Tracing/profiling: jax.profiler integration + step timing meters with the
reference's per-sample total/data/DNN split (SURVEY §5: AverageMeter wall-clock,
AVE/traintest_adapt_ave29.py:19,151-186) and an analytic FLOPs counter via XLA
cost analysis (replacing the hand-written attention flops() methods)."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from ..metrics.stats import AverageMeter


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TPU timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepMeters:
    """per-sample total / data-loading / DNN-compute wall-clock, printed every
    n_print_steps like the reference engine."""

    def __init__(self, n_print_steps: int = 100):
        self.total = AverageMeter()
        self.data = AverageMeter()
        self.dnn = AverageMeter()
        self.loss = AverageMeter()
        self.n_print = n_print_steps
        self._t0 = time.time()
        self._step = 0

    def data_loaded(self, batch_size: int):
        now = time.time()
        self.data.update((now - self._t0) / batch_size, batch_size)
        self._t_data = now

    def step_done(self, batch_size: int, loss: Optional[float] = None):
        now = time.time()
        self.dnn.update((now - self._t_data) / batch_size, batch_size)
        self.total.update((now - self._t0) / batch_size, batch_size)
        if loss is not None:
            self.loss.update(loss, batch_size)
        self._t0 = now
        self._step += 1
        if self._step % self.n_print == 0:
            print(f"step {self._step}: per-sample total {self.total.avg*1e3:.2f} ms "
                  f"(data {self.data.avg*1e3:.2f} ms, dnn {self.dnn.avg*1e3:.2f} ms)"
                  f" loss {self.loss.avg:.4f}", flush=True)

    def report(self) -> Dict[str, float]:
        return {"per_sample_total_s": self.total.avg,
                "per_sample_data_s": self.data.avg,
                "per_sample_dnn_s": self.dnn.avg,
                "loss": self.loss.avg}


def cost_analysis(fn, *args) -> Dict[str, float]:
    """XLA-reported flops/bytes for a jittable fn (analytic FLOPs counter)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {k: float(v) for k, v in ca.items()
            if k in ("flops", "bytes accessed")} if ca else {}
