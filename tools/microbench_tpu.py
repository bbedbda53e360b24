"""TPU round-trip microbenchmark: where does per-block time go?

Measures, for a cached levenshtein kernel at several block sizes:
  upload_s   — jnp.asarray of the packed codes block (host -> device)
  kernel_s   — dispatch + block_until_ready with resident inputs
  fetch_s    — np.asarray of the [F, B] stats (device -> host)
  rt_lat_s   — a 1-element round-trip (pure relay latency)

Run: python tools/microbench_tpu.py [width]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from strsim_tpu.models.pipeline import _get_kernel

    impls = (("levenshtein", "xla"), ("jaro", "xla"), ("multiset", "xla"))
    kernel = jax.jit(_get_kernel(("levenshtein",), impls))

    # pure round-trip latency
    one = np.ones((8, 8), np.int32)
    rt = timeit(lambda: np.asarray(jnp.asarray(one) + 1))
    print(f"roundtrip 8x8: {rt*1000:.1f} ms")

    for block in (4096, 65536, 262144):
        rng = np.random.default_rng(0)
        packed = rng.integers(97, 123, size=(block, 2 * width), dtype=np.int32).astype(np.int8)
        lens = np.full((block, 2), width // 2, dtype=np.int32)

        up = timeit(lambda: jax.block_until_ready(jnp.asarray(packed)))
        dev_packed = jnp.asarray(packed)
        dev_lens = jnp.asarray(lens)
        k = timeit(lambda: jax.block_until_ready(kernel(dev_packed, dev_lens)))
        res = kernel(dev_packed, dev_lens)
        jax.block_until_ready(res)
        fe = timeit(lambda: np.asarray(res))
        e2e = timeit(lambda: np.asarray(kernel(jnp.asarray(packed), jnp.asarray(lens))))
        print(
            f"block {block:7d} w{width}: upload {up*1000:7.1f} ms | kernel {k*1000:7.1f} ms"
            f" | fetch {fe*1000:7.1f} ms | e2e {e2e*1000:7.1f} ms | {block/e2e:,.0f} pairs/s"
        )





def pipelined(width=8, block=262144, chain=16):
    """True kernel throughput: N dispatches on resident data, one sync."""
    from strsim_tpu.models.pipeline import _get_kernel

    impls = (("levenshtein", "xla"), ("jaro", "xla"), ("multiset", "xla"))
    rng = np.random.default_rng(0)
    packed = rng.integers(97, 123, size=(block, 2 * width), dtype=np.int32).astype(np.int8)
    lens = np.full((block, 2), max(2, width // 2), dtype=np.int32)
    dev_packed = jnp.asarray(packed)
    dev_lens = jnp.asarray(lens)
    for name, measures in (
        ("levenshtein", ("levenshtein",)),
        ("jaro", ("jaro",)),
        ("multiset", ("jaccard",)),
        ("fused5", ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice")),
    ):
        kernel = jax.jit(_get_kernel(measures, impls))
        jax.block_until_ready(kernel(dev_packed, dev_lens))  # compile
        t0 = time.perf_counter()
        outs = [kernel(dev_packed, dev_lens) for _ in range(chain)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / chain
        print(f"resident {name:12s} w{width:3d} block {block}: {dt*1000:7.2f} ms/call = {block/dt:,.0f} pairs/s")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "resident":
        pipelined(int(sys.argv[1]))
    else:
        main()
