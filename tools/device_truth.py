"""Honest device-kernel throughput through an untrusted relay.

Client-side chained-dispatch timing is not trustworthy on the axon relay
(block_until_ready can return before remote completion; identical requests
can be deduplicated). This harness measures kernel time in a way no relay
can fake:

  * ONE dispatch runs the kernel over C resident chunks inside a single
    executable (lax.scan), returning per-chunk stat checksums (tiny);
  * completion is forced by fetching the tiny output (np.asarray);
  * fixed costs (round-trip latency, dispatch, fetch) cancel by differencing
    wall times at two chunk counts:  t_block = (wall(C2) - wall(C1)) / (C2-C1).

Run: timeout 1800 python tools/device_truth.py [width ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.models.pipeline import _get_kernel, _ensure_compile_cache

BLOCK = 262144
C1, C2 = 2, 10


def make_inputs(width, chunks, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(chunks, BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(chunks, BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, None, :]
    packed[:, :, :width][pos >= lens[:, :, :1]] = -1
    packed[:, :, width:][pos >= lens[:, :, 1:2]] = -2
    return packed.astype(np.int8), lens


def scanner(measures, impls):
    base = _get_kernel(measures, impls)

    def run(codes3, lens3):  # [C, B, 2W], [C, B, 2] -> [C, F] checksums
        def step(carry, t):
            stats = base(t[0], t[1])  # [F, B]
            return carry, jnp.sum(stats.astype(jnp.int64), axis=1)

        _, sums = lax.scan(step, 0, (codes3, lens3))
        return sums

    return jax.jit(run)


def wall(fn, dev_args):
    t0 = time.perf_counter()
    np.asarray(fn(*dev_args))  # fetch of tiny output forces completion
    return time.perf_counter() - t0


def bench(measures, impls, width, label, reps=3):
    run = scanner(measures, impls)
    packed, lens = make_inputs(width, C2)
    d_codes = jnp.asarray(packed)
    d_lens = jnp.asarray(lens)
    args1 = (d_codes[:C1], d_lens[:C1])
    args2 = (d_codes, d_lens)
    # compile both shapes + warm
    wall(run, args1)
    wall(run, args2)
    best = []
    for _ in range(reps):
        t1 = wall(run, args1)
        t2 = wall(run, args2)
        best.append((t2 - t1) / (C2 - C1))
    t_block = min(best)
    print(
        f"{label:26s} w{width:3d}: {t_block*1000:8.3f} ms/block = "
        f"{BLOCK/t_block:>14,.0f} pairs/s   (walls C1 {t1:.3f}s C2 {t2:.3f}s)",
        flush=True,
    )
    return BLOCK / t_block


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31, 63]
    for width in widths:
        for label, measures, impls in (
            ("lev myers", ("levenshtein",), (("levenshtein", "myers"),)),
            ("lev wavefront", ("levenshtein",), (("levenshtein", "wavefront"),)),
            ("jaro bitmask", ("jaro",), (("jaro", "bitmask"),)),
            ("jaro scan", ("jaro",), (("jaro", "scan"),)),
            ("multiset loop", ("jaccard",), (("multiset", "xla"),)),
            ("multiset table", ("jaccard",), (("multiset", "table"),)),
            (
                "fused5 new",
                ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice"),
                (("levenshtein", "myers"), ("jaro", "bitmask"), ("multiset", "xla")),
            ),
        ):
            try:
                bench(measures, impls, width, label)
            except Exception as e:  # noqa: BLE001
                print(f"{label:26s} w{width:3d}: FAILED {type(e).__name__}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
