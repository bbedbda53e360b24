"""A/B on real TPU: Pallas OSA scan (ops/osa_pallas_scan.py) vs the XLA
bit-parallel OSA kernel (ops/osa_myers.py), bit-exact checked at every width.

Same relay-immune methodology as the production bench (chunk-differenced
marginal block time, utils/devicetime.py). The W=2 multiword variant cannot
be interpret-validated in CI time (same XLA:CPU limitation as the
levenshtein scan, tests/test_pallas.py:104-110) — THIS probe is its
correctness evidence: the device results are compared bit-for-bit against
the XLA kernel, which is itself differential-locked to the classic DP
oracle on CPU.

Measured on v5e (2026-08-18), bit_exact=True at every width:

    w  7  xla 1350.1 M pairs/s   pallas 3476.0 M pairs/s   (+157%)
    w 15  xla 1140.0 M pairs/s   pallas 1484.2 M pairs/s   (+30%)
    w 31  xla  494.7 M pairs/s   pallas  638.1 M pairs/s   (+29%)
    w 47  xla  127.9 M pairs/s   pallas  235.4 M pairs/s   (+84%)
    w 63  xla   76.9 M pairs/s   pallas  150.8 M pairs/s   (+96%)

Unlike levenshtein (where Pallas only pays at w <= 31 and the XLA kernel
stays competitive), the OSA scan wins at EVERY width: the two extra carried
vectors double the XLA while-loop's per-step carry traffic, while the
VMEM-resident unrolled kernel keeps them in registers.

Usage: timeout 1800 python tools/ab_osa_pallas.py [widths...]
"""
import os
import sys
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.osa_myers import osa_distance_myers
from strsim_tpu.ops.osa_pallas_scan import osa_distance_pallas
from strsim_tpu.utils import encode as enc
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144


def make_batch(width: int, n: int):
    rng = random.Random(width * 7919)
    alpha = "abcdefghijklmnop"
    lo = max(1, (width + 1) // 2 - 2)  # lengths that bucket to this width
    pairs = []
    for i in range(n):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(lo, width + 1)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(lo, width + 1)))
        if i % 9 == 0:
            b = a
        if i % 17 == 0 and len(a) > 2:  # adjacent swap: exercises TR
            k = rng.randrange(len(a) - 1)
            b = a[:k] + a[k + 1] + a[k] + a[k + 2:]
        pairs.append((a, b))
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=width)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=width)
    return a, b


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31, 47, 63]
    print(f"backend={jax.default_backend()}", flush=True)
    for width in widths:
        a, b = make_batch(width, BLOCK)
        packed = np.concatenate([a.codes, b.codes], axis=1)
        lens = np.stack([a.lengths, b.lengths], axis=1).astype(np.int32)
        dev_codes = jnp.asarray(packed.reshape(1, BLOCK, 2 * width))
        dev_lens = jnp.asarray(lens.reshape(1, BLOCK, 2))

        def xla_kernel(codes2, lens2, _w=width):
            aa, bb = codes2[:, :_w], codes2[:, _w:]
            return osa_distance_myers(aa, bb, lens2[:, 0], lens2[:, 1])[None]

        def pallas_kernel(codes2, lens2, _w=width):
            aa, bb = codes2[:, :_w], codes2[:, _w:]
            return osa_distance_pallas(aa, bb, lens2[:, 0], lens2[:, 1])[None]

        got_x = np.asarray(jax.jit(xla_kernel)(dev_codes[0], dev_lens[0]))[0]
        got_p = np.asarray(jax.jit(pallas_kernel)(dev_codes[0], dev_lens[0]))[0]
        exact = bool((got_x == got_p).all())
        t_x = marginal_block_time(xla_kernel, dev_codes, dev_lens)
        t_p = marginal_block_time(pallas_kernel, dev_codes, dev_lens)
        print(
            f"w{width:3d}  xla {BLOCK / t_x / 1e6:8.1f} M pairs/s   "
            f"pallas {BLOCK / t_p / 1e6:8.1f} M pairs/s   "
            f"({(t_x / t_p - 1) * 100:+.0f}%)  bit_exact={exact}",
            flush=True,
        )
        assert exact, f"w{width}: pallas != xla"


if __name__ == "__main__":
    main()
