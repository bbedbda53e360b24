"""Relay-immune device-kernel timing.

Client-side timing of dispatched work is not trustworthy through a remote
relay (this environment's axon tunnel): block_until_ready can return before
remote completion, identical requests can be deduplicated, and per-dispatch
relay costs dominate queue-drain time. The only number no relay can fake is
the MARGINAL on-device time of extra work inside one executable:

    run(C) = one dispatch: lax.scan of the kernel over C device-resident
             chunks, accumulating a checksum, returning one scalar;
    wall(C) = dispatch + C * t_block + fetch(scalar)
    t_block = (wall(C2) - wall(C1)) / (C2 - C1)

Fixed relay costs cancel in the difference. The chunk count adapts upward
(device-side tiling of the staged chunks — no extra host uploads) until the
difference is large against wall-clock noise.

Why a scan over distinct chunk indices rather than a repetition loop over the
same chunk: XLA hoists loop-invariant computations out of while loops, so a
"run the same kernel R times" loop can legally execute the kernel once. A
scan body reads its chunk through a dynamic slice on the iteration index —
per-iteration execution cannot be elided. (Tiled chunks hold identical VALUES
but XLA cannot prove that.)
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_runner_cache: Dict[int, Callable] = {}


def _runner(base_kernel: Callable) -> Callable:
    fn = _runner_cache.get(id(base_kernel))
    if fn is None:

        def run(codes3, lens3):  # [C, B, 2W], [C, B, 2] -> scalar checksum
            def step(carry, t):
                stats = base_kernel(t[0], t[1])  # [F, B]
                return carry + jnp.sum(stats.astype(jnp.int32)), None

            total, _ = lax.scan(step, jnp.int32(0), (codes3, lens3))
            return total

        fn = jax.jit(run)
        _runner_cache[id(base_kernel)] = fn
    return fn


def _tile(codes3, lens3, c: int):
    C = codes3.shape[0]
    if c <= C:
        return codes3[:c], lens3[:c]
    k = -(-c // C)
    return (
        jnp.tile(codes3, (k, 1, 1))[:c],
        jnp.tile(lens3, (k, 1, 1))[:c],
    )


def _wall(fn, codes3, lens3) -> float:
    import numpy as np

    t0 = time.perf_counter()
    np.asarray(fn(codes3, lens3))  # scalar fetch forces remote completion
    return time.perf_counter() - t0


def marginal_block_time(
    base_kernel: Callable,
    codes3,
    lens3,
    c1: int = 1,
    c2: int = 9,
    reps: int = 3,
    min_delta_s: float = 0.1,
    max_bytes: int = 4 << 30,
) -> float:
    """Seconds of on-device time per chunk of `codes3` for one base_kernel
    pass. codes3/lens3 must already be device-resident jax arrays shaped
    [C, B, 2W] / [C, B, 2]. Chunks may be tiled device-side to raise the
    measured delta above relay wall-clock noise."""
    chunk_bytes = int(codes3.dtype.itemsize)
    for d in codes3.shape[1:]:
        chunk_bytes *= int(d)
    max_chunks = max(int(max_bytes // max(chunk_bytes, 1)), c2)
    run = _runner(base_kernel)
    while True:
        a1 = _tile(codes3, lens3, c1)
        a2 = _tile(codes3, lens3, c2)
        _wall(run, *a1)  # compile + warm both shapes
        _wall(run, *a2)
        deltas = []
        for _ in range(reps):
            t1 = _wall(run, *a1)
            t2 = _wall(run, *a2)
            deltas.append(t2 - t1)
        delta = min(deltas)
        if delta >= min_delta_s or c2 >= max_chunks:
            return max(delta, 1e-9) / (c2 - c1)
        est = max(delta / (c2 - c1), 1e-5)  # optimistic per-chunk estimate
        c2 = min(max(int(min_delta_s / est * 1.25), c2 * 2), max_chunks)
