"""Timers, metric logging, and profiling helpers."""

from wssdl_bus_tpu.utils.timer import Timer
from wssdl_bus_tpu.utils.logging import MetricLogger, TraceContext

__all__ = ["Timer", "MetricLogger", "TraceContext"]
