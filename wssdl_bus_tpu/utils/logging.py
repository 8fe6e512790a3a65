"""Observability: scalar metric logging + device tracing.

The reference logs (a) stdout loss prints every DISPLAY iters, (b) an
append-mode ``log.txt`` in the output dir, and (c) TensorBoard scalars
(train_bus.py:707,719,779-786,901-948); its DEBUG_TIMELINE flag dumps Chrome
traces of single ``sess.run`` calls (train_bus.py:353-355).

Here: ``MetricLogger`` handles (a)-(c) — TensorBoard via
``torch.utils.tensorboard`` when importable, silently skipped otherwise —
and ``TraceContext`` wraps ``jax.profiler`` for the timeline equivalent
(view with TensorBoard or Perfetto).
"""

from __future__ import annotations

import os

class MetricLogger:
    def __init__(self, output_dir: str, tensorboard: bool = True):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.log_path = os.path.join(output_dir, "log.txt")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=output_dir)
            except Exception:
                self._tb = None

    def text(self, line: str):
        """Append one line to log.txt (reference train_bus.py:719,938-948)."""
        with open(self.log_path, "a") as f:
            f.write(line.rstrip("\n") + "\n")

    def scalars(self, step: int, **values: float):
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), step)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()


class TraceContext:
    """jax.profiler trace scope — the DEBUG_TIMELINE analog."""

    def __init__(self, output_dir: str, enabled: bool = False):
        self.dir = os.path.join(output_dir, "jax_trace")
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            import jax
            jax.profiler.start_trace(self.dir)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import jax
            jax.profiler.stop_trace()
        return False
