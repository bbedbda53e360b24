"""Round-2 kernel shootout: new bit-parallel kernels vs round-1 kernels.

Device-resident timing (chained dispatch, one sync) per width and impl, with
realistic random lengths (uniform 1..width) so dynamic trip counts pay what a
real length-sorted block would. Prints one line per (kernel, width, impl).

Run: timeout 1800 python tools/bench_kernels_r2.py [chain]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strsim_tpu.models.pipeline import _get_kernel, _ensure_compile_cache

BLOCK = 262144
CHAIN = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    # apply pads past lengths (PAD_A / PAD_B)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = -1
    packed[:, width:][pos >= lens[:, 1:2]] = -2
    return jnp.asarray(packed.astype(np.int8)), jnp.asarray(lens)


def bench(measures, impls, width, label):
    _ensure_compile_cache()
    kernel = jax.jit(_get_kernel(measures, impls))
    dev_packed, dev_lens = make_inputs(width)
    t0 = time.perf_counter()
    jax.block_until_ready(kernel(dev_packed, dev_lens))  # compile+warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [kernel(dev_packed, dev_lens) for _ in range(CHAIN)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / CHAIN
    print(
        f"{label:26s} w{width:3d}: {dt*1000:8.2f} ms/call = {BLOCK/dt:>12,.0f} pairs/s"
        f"   (compile {compile_s:.1f}s)",
        flush=True,
    )
    return BLOCK / dt


def main():
    results = {}
    for width in (7, 15, 31, 63):
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
                results[(label, width)] = bench(measures, impls, width, label)
            except Exception as e:  # noqa: BLE001
                print(f"{label:26s} w{width:3d}: FAILED {type(e).__name__}: {e}", flush=True)
    print("\nDONE")


if __name__ == "__main__":
    main()
