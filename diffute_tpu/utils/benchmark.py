"""Reliable device timing on the axon-tunneled TPU.

On this backend ``block_until_ready`` returns before the computation is
actually finished and scalar-slice fetches can stall; the only trustworthy
sync is a full ``jax.device_get`` of a program output.  ``time_op`` therefore
embeds the op in two ``lax.scan`` loops of different lengths inside one jit
and reports (t_long - t_short) / (L_long - L_short), cancelling dispatch,
transfer, and fixed overheads.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_op(op: Callable, x0, *consts, short: int = 10, long: int = 50,
            repeats: int = 3) -> float:
    """Seconds per application of ``op`` (carry-chained: x -> op(x, *consts)).

    ``op`` must map x to an array of x's shape (chainable).
    """

    def make(length):
        @jax.jit
        def run(x, *cs):
            def body(x, _):
                return op(x, *cs), None
            o, _ = jax.lax.scan(body, x, None, length=length)
            return o
        return run

    r_short, r_long = make(short), make(long)
    jax.device_get(r_short(x0, *consts))  # compile
    jax.device_get(r_long(x0, *consts))

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(r_short(x0, *consts))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(r_long(x0, *consts))
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (long - short))
    return best


def time_fn(fn: Callable, *args, repeats: int = 5) -> float:
    """End-to-end seconds per call of a function whose outputs are fetched
    with device_get (true completion)."""
    jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
