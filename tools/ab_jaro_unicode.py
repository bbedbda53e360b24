"""A/B: fused Pallas jaro kernel on wide-codepoint (int32) tiles — halfword
(pack=2, BMP) and full-word (pack=1, astral) transposition compaction — vs
the XLA packed-flag bitmask kernel that served all int32 buckets through
round 3.

The fused kernel's win on int8 tiles came from removing the HBM EqB tensor
and the [L, L, B] transposition reduce; both savings are dtype-independent
(the kernel lifts tiles to i32 lanes regardless), so int32 buckets should see
a comparable gain. Only the compaction state doubles (pack=2) or quadruples
(pack=1) — a small fraction of the 3-ops-per-position EqB build.

Results drive _jaro_impl_for's "pallas_scan_h"/"pallas_scan_f" auto policy
and land in docs/ROOFLINE.md.

Usage: timeout 1800 python tools/ab_jaro_unicode.py [widths...]
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


def make_inputs(width, seed=0, astral=False):
    """Cyrillic-range alphabet (dense matches, all > 0xFF) with either BMP
    CJK spice (pack=2 regime) or astral-plane spice (pack=1 regime)."""
    rng = np.random.default_rng(seed)
    packed = rng.integers(0x430, 0x43A, size=(BLOCK, 2 * width), dtype=np.int32)
    spice = rng.random(packed.shape) < 0.15
    hi = (0x10000, 0x10FFFF) if astral else (0x4E00, 0x9FFF)
    packed[spice] = rng.integers(hi[0], hi[1], size=int(spice.sum()))
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = PAD_A
    packed[:, width:][pos >= lens[:, 1:2]] = PAD_B
    return packed, lens


def wrap(fn, width, **kw):
    def kernel(codes, lens):
        m, t = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1], **kw)
        return jnp.stack([m, t])[None]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31, 63, 95, 127]
    results = []
    for width in widths:
        for pack in (2, 1):
            packed, lens = make_inputs(width, astral=(pack == 1))
            codes3 = jnp.asarray(packed[None])
            lens3 = jnp.asarray(lens[None])
            base = wrap(jaro_match_stats_bitmask, width)
            r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
            row = {"width": width, "pack": pack, "block": BLOCK}
            try:
                pk = wrap(jaro_match_stats_pallas_scan, width, pack=pack)
                r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                exact = bool(np.array_equal(r0, r1))
                tag = "" if exact else "  MISMATCH!"
                t = marginal_block_time(pk, codes3, lens3)
                row.update(fused_pairs_per_sec=BLOCK / t, bit_exact=exact)
                print(
                    f"w{width:3d} pallas-fused/pack{pack}: {t*1000:8.4f} ms/block "
                    f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:160]
                row.update(fused_error=f"{type(e).__name__}: {msg}")
                print(
                    f"w{width:3d} pallas-fused/pack{pack}: FAIL "
                    f"{type(e).__name__}: {msg}",
                    flush=True,
                )
            t = marginal_block_time(base, codes3, lens3)
            row["bitmask_pairs_per_sec"] = BLOCK / t
            if "fused_pairs_per_sec" in row:
                row["speedup"] = row["fused_pairs_per_sec"] / row["bitmask_pairs_per_sec"]
            results.append(row)
            print(
                f"w{width:3d} xla-bitmask (i32)  : {t*1000:8.4f} ms/block "
                f"= {BLOCK/t/1e6:8.1f} M pairs/s",
                flush=True,
            )
    import json

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_UNICODE.json")
    with open(out, "w") as f:
        json.dump({"kernel": "jaro fused pallas (int32 tiles)",
                   "workload": "262144-pair blocks, Cyrillic alphabet + "
                               "CJK (pack=2) / astral (pack=1) spice, "
                               "uniform lengths 1..width",
                   "rows": results}, f, indent=1)
    print(f"wrote {out}", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
