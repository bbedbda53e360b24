"""A/B: round-3 fused Pallas jaro kernel (in-kernel EqB + greedy scan +
byte-compacted transposition, ops/jaro_pallas_scan.py) vs the round-2 XLA
packed-flag kernel (ops/jaro_bitmask.py).

The round-2 attempt (tools/ab_jaro_pallas.py) moved only the scan into Pallas
and measured +1-10% — the [L, L, B] transposition reduce and the HBM-resident
EqB build dominated and stayed in XLA. This kernel fuses all three stages into
one VMEM-resident program and replaces the L² transposition table with an
O(L) byte-compaction compare (see the module docstring), which is the
VERDICT-r2 item-1 prescription.

Results land in docs/ROOFLINE.md and drive the pipeline's jaro_impl="auto"
policy.

Usage: timeout 1800 python tools/ab_jaro_fused.py [widths...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan
from strsim_tpu.utils.encode import PAD_A, PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = PAD_A
    packed[:, width:][pos >= lens[:, 1:2]] = PAD_B
    return packed.astype(np.int8), lens


def wrap(fn, width, **kw):
    def kernel(codes, lens):
        m, t = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1], **kw)
        return jnp.stack([m, t])[None]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31, 47, 63]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(jaro_match_stats_bitmask, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        for br in (8192, 16384):
            try:
                pk = wrap(jaro_match_stats_pallas_scan, width, block_rows=br)
                r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                t = marginal_block_time(pk, codes3, lens3)
                print(
                    f"w{width:3d} pallas-fused/br{br:6d}: {t*1000:8.4f} ms/block "
                    f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:160]
                print(
                    f"w{width:3d} pallas-fused/br{br}: FAIL {type(e).__name__}: {msg}",
                    flush=True,
                )
        t = marginal_block_time(base, codes3, lens3)
        print(
            f"w{width:3d} xla-bitmask : {t*1000:8.4f} ms/block "
            f"= {BLOCK/t/1e6:8.1f} M pairs/s",
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
