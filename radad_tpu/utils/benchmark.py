"""Honest TPU timing helpers for this environment.

The axon relay acks ``block_until_ready`` before real device completion
(measured: 8192³ matmuls "finishing" at 300× hardware peak), so wall-clock
benchmarks MUST (a) force a host transfer of a small result to synchronize,
and (b) amortize per-op cost with a data-dependent chain inside one jit —
``time(chain(n)) - time(chain(1))`` divided by ``n-1``.

Also: the first real execution after process start pays a multi-minute relay
warmup; always do one throwaway synchronized roundtrip first.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def warmup(x: jnp.ndarray = None) -> None:
    """One synchronized roundtrip to absorb the relay's first-run warmup."""
    if x is None:
        x = jnp.ones((8, 128), jnp.float32)
    np.asarray(jnp.sum(x))


def chain_time(step: Callable, state0, n: int = 20, *, consts=(),
               reps: int = 3) -> float:
    """Median seconds per invocation of ``step(state, *consts) -> state``,
    measured as the delta between an n-step and a 1-step dependent chain,
    each ending in a scalar host transfer.

    Pass every large array via ``consts`` — NOT via closure. Closed-over
    arrays become HLO constants and the relay's remote-compile endpoint
    rejects oversized payloads (HTTP 413)."""

    def chain(state, consts, steps: int):
        out = jax.lax.fori_loop(
            0, steps, lambda i, s: step(s, *consts), state)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    chain1 = jax.jit(lambda s, c: chain(s, c, 1))
    chainn = jax.jit(lambda s, c: chain(s, c, n))
    np.asarray(chain1(state0, consts))  # compile + warm
    np.asarray(chainn(state0, consts))

    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain1(state0, consts))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chainn(state0, consts))
        tn = time.perf_counter() - t0
        deltas.append((tn - t1) / (n - 1))
    return float(np.median(deltas))


def timed_call(fn: Callable, *args, reps: int = 5) -> float:
    """Median seconds for fn(*args) ending in a host transfer of its
    (assumed small) output. Use only for ops big enough to dwarf the ~20 ms
    relay roundtrip."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for l in jax.tree_util.tree_leaves(out):
            np.asarray(l)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
