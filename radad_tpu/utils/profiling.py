"""Profiling & tracing utilities.

The reference's profiling surface is ad-hoc timed loops with
``cuda.synchronize`` (``/root/reference/projection.py:140-153``,
``detection_model.py:272-306``) plus epoch wall-times in metrics.csv. The
TPU equivalents here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable device trace of everything run inside;
  * ``profile_fn`` — the timed-loop module profiler, built on the honest
    chained-execution methodology from ``radad_tpu.utils.benchmark``
    (plain block_until_ready timing is unreliable through this
    environment's TPU relay);
  * ``annotate`` — named trace spans (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Dict

import jax
import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named span inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def profile_fn(fn: Callable, *args, iterations: int = 20,
               warmup_iters: int = 2, label: str = "fn") -> Dict[str, float]:
    """Timed-loop profile of a jitted callable → stats dict.

    Synchronizes via host transfer of (small) outputs, matching the
    reference's profile_performance contract but with transfer-based sync
    instead of cuda.synchronize.
    """
    for _ in range(warmup_iters):
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
    times = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    stats = {
        "label": label,
        "mean_ms": float(times.mean() * 1e3),
        "median_ms": float(np.median(times) * 1e3),
        "p90_ms": float(np.percentile(times, 90) * 1e3),
        "iterations": iterations,
    }
    logger.info("profile %s: %.3f ms median (%d iters)",
                label, stats["median_ms"], iterations)
    return stats


def memory_stats() -> Dict[str, int]:
    """Device memory snapshot when the backend exposes it."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        return {k: int(v) for k, v in stats.items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}
