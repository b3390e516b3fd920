"""Metric logging: TensorBoard writer + stdout fallback.

Replaces the reference's accelerate tracker plumbing
(``init_trackers("text2image-fine-tune")`` + per-step ``accelerator.log``,
train_diffute_v1.py:811-812,938).  Scalars arrive as device arrays; they are
fetched once per log call (host transfer), never inside the jit step.
"""

from __future__ import annotations

from typing import Dict, Optional


class MetricWriter:
    def __init__(self, logdir: Optional[str] = None, flush_every: int = 20):
        self._tb = None
        self._n = 0
        self._flush_every = flush_every
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except ImportError:
                try:
                    import tensorboardX

                    self._tb = tensorboardX.SummaryWriter(logdir)
                except ImportError:
                    self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        vals = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in vals.items():
                self._tb.add_scalar(k, v, step)
            self._n += 1
            if self._n % self._flush_every == 0:
                self._tb.flush()
        else:
            line = " ".join(f"{k}={v:.5f}" for k, v in vals.items())
            print(f"[step {step}] {line}", flush=True)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
