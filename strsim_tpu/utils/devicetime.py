"""Relay-immune device-kernel timing.

Client-side timing of dispatched work is not trustworthy through a remote
relay (this environment's axon tunnel): block_until_ready can return before
remote completion, identical requests can be deduplicated, and per-dispatch
relay costs dominate queue-drain time. The only number no relay can fake is
the MARGINAL on-device time of extra work inside one executable:

    run(R) = one dispatch that loops the kernel R times over C resident
             chunks (lax.fori_loop over lax.scan), each repetition's checksum
             feeding the next as a carry (a real data dependency, so nothing
             can be elided or deduplicated), returning one scalar;
    wall(R) = dispatch + R * C * t_block + fetch(scalar)
    t_block = (wall(R2) - wall(R1)) / ((R2 - R1) * C)

Fixed relay costs cancel in the difference; repetitions adapt until the
difference is large against wall-clock noise.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_runner_cache: Dict[Tuple[int, int], Callable] = {}


def _make_runner(base_kernel: Callable, repeats: int) -> Callable:
    key = (id(base_kernel), repeats)
    fn = _runner_cache.get(key)
    if fn is None:

        def run(codes3, lens3):  # [C, B, 2W], [C, B, 2] -> scalar checksum
            def rep(_, acc):
                def step(carry, t):
                    stats = base_kernel(t[0], t[1])  # [F, B]
                    return carry + jnp.sum(stats.astype(jnp.int32)), None

                total, _ = lax.scan(step, acc, (codes3, lens3))
                return total

            return lax.fori_loop(0, repeats, rep, jnp.int32(0))

        fn = jax.jit(run)
        _runner_cache[key] = fn
    return fn


def _wall(fn, codes3, lens3) -> float:
    t0 = time.perf_counter()
    import numpy as np

    np.asarray(fn(codes3, lens3))  # scalar fetch forces remote completion
    return time.perf_counter() - t0


def marginal_block_time(
    base_kernel: Callable,
    codes3,
    lens3,
    r1: int = 1,
    r2: int = 9,
    reps: int = 3,
    min_delta_s: float = 0.15,
    max_r2: int = 4096,
) -> float:
    """Seconds of on-device time per chunk of `codes3` for one base_kernel
    pass. codes3/lens3 must already be device-resident jax arrays shaped
    [C, B, 2W] / [C, B, 2]."""
    C = codes3.shape[0]
    while True:
        f1 = _make_runner(base_kernel, r1)
        f2 = _make_runner(base_kernel, r2)
        _wall(f1, codes3, lens3)  # compile + warm both shapes
        _wall(f2, codes3, lens3)
        deltas = []
        for _ in range(reps):
            t1 = _wall(f1, codes3, lens3)
            t2 = _wall(f2, codes3, lens3)
            deltas.append(t2 - t1)
        delta = min(deltas)
        if delta >= min_delta_s or r2 >= max_r2:
            return max(delta, 1e-9) / ((r2 - r1) * C)
        # too small against relay noise: scale the repetition count up
        est = max(delta, 1e-3)
        scale = min(max(int(min_delta_s / est * 1.5), 2), 16)
        r2 = min(r2 * scale, max_r2)
