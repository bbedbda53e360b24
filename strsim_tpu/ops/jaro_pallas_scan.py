"""Pallas (Mosaic) fused Jaro kernel — VMEM-resident scan + compacted
transposition. Round-3 production kernel for byte-width (ASCII) tiles.

Reference semantics: the greedy windowed match scan and ordered transposition
count of src/expressions/strsim.rs:200-243, identical integer contract to
ops.jaro_bitmask.jaro_match_stats_bitmask (m = greedy match count, t = raw
transposition count before the integer t/2 halving, which stays in the host
finalizer for bit-for-float parity).

Why a fused kernel: the round-2 XLA bitmask kernel spends its time in two
places the scan itself never touches (docs/ROOFLINE.md cost model):

  * the EqB precompute materializes an [L, W, B] bitmask tensor in HBM
    between the parallel build and the sequential fori_loop;
  * the transposition count is a parallel [L, L, B] compare+reduce — the
    4·L² term that dominates every width.

This kernel removes both. The whole program is VMEM-resident and fully
unrolled (L static per bucket):

  * EqB words are built INSIDE the scan step from the i32 char tiles (same
    trick as ops/levenshtein_pallas_scan.py): 3 ops per real b-position, no
    HBM tensor, bits beyond len_b identically 0 because PAD_B never equals a
    real char (utils/encode.py).
  * The greedy "first unflagged equal b-char in the window" is lowest-set-bit
    extraction over W packed uint32 flag words with a low-word-first
    suppression chain — exact greedy order (strsim.rs:209-218).
  * The transposition count (strsim.rs:220-237: r-th matched a-char vs r-th
    flagged b-char, count unequal pairs) is computed WITHOUT the L² rank
    table: both match sequences are compacted rank-by-rank into byte-packed
    i32 words (4 chars per word, dynamic per-lane byte insert = W/4 select-ors),
    the a-side during the scan itself (matched a-chars arrive in rank order),
    the b-side in one unrolled pass over the final flag words. t is then one
    xor + per-byte nonzero count over ceil(L/4) words — O(L) lane ops total.
    Unwritten slots are 0 on BOTH sides (both sequences hold exactly m
    entries), so no rank mask is needed.

The compaction slot width is parametric (`pack` = chars per i32 word):
pack=4 (bytes) serves int8/pure-ASCII tiles; pack=2 (halfwords) serves int32
buckets whose codepoints all fit 16 bits (the whole BMP — the pipeline
computes the bucket max during tile narrowing and routes here); pack=1 (one
char per word) serves astral-plane codepoints. Equality of packed slots is
equality of chars whenever every char fits the slot, so all three are exact;
only the compaction/t-count cost scales (WP = ceil(L/pack) words), and the
per-step cost is dominated by the 3-ops-per-position EqB build either way.
Non-TPU backends keep the XLA bitmask kernel. Off-TPU the identical kernel
runs under the Pallas interpreter (exactness tests use this).

Exactness: every statistic stays integer; rows with an empty side yield
m = 0 (resolved by the host finalizer, ops/finalize.py); the len-1/len-1
direct-compare special case (strsim.rs:197-199) is patched outside the
kernel exactly as the XLA kernel does.

Measured on v5e (262144-row blocks, bit-exact vs the XLA bitmask kernel):
see docs/ROOFLINE.md round-3 table and tools/ab_jaro_fused.py.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array

_WORD = 32
_SUB = 8  # sublane fold
_ALL_ONES = np.uint32(0xFFFFFFFF)
DEFAULT_BLOCK_ROWS = 8192

# fully-unrolled program: L*(3L + ~2W4 + ~18W) straight-line vector ops.
# L = 64 lands ~18K ops — the same ballpark the levenshtein scan compiles
# comfortably at; wider buckets route to the fori_loop wide kernel.
_MAX_WIDTH = 64
_MAX_WIDTH_WIDE = 512  # fori_loop wide variant: the whole bucket ladder


def supports_width(L: int) -> bool:
    """True iff a kernel specialization covers padded width L (unrolled at
    L <= 64, fori_loop wide variant through 512 — measured +150..223% over
    the XLA bitmask kernel at w95/127/255/511, tools/ab_jaro_wide.py)."""
    return L <= _MAX_WIDTH_WIDE


def _satmask(k: Array) -> Array:
    """Per-lane uint32 mask of the k lowest bits, saturating: k <= 0 -> 0,
    k >= 32 -> all ones (same contract as ops/jaro_bitmask._satmask)."""
    kc = jnp.clip(k, 0, _WORD - 1).astype(jnp.uint32)
    base = (np.uint32(1) << kc) - np.uint32(1)
    return jnp.where(k >= _WORD, _ALL_ONES, jnp.where(k <= 0, np.uint32(0), base))


def _pack_params(pack: int) -> Tuple[int, int]:
    """(log2 pack, log2 slot bits) for `pack` compacted chars per i32 word."""
    return {4: (2, 3), 2: (1, 4), 1: (0, 5)}[pack]


def _kernel(a_ref, b_ref, la_ref, lb_ref, m_ref, t_ref, *, L: int, pack: int):
    """a_ref/b_ref: [1, L, 8, BR8] i32 char tiles (values must fit a 32/pack-
    bit compaction slot; PAD past each length); la/lb/m/t: [1, 8, BR8] i32."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)   # packed flag words
    WP = -(-L // pack)   # compacted sequence words (pack chars per i32)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    bound = jnp.maximum(la, lb) // 2 - 1  # strsim.rs:200

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    flag = [jnp.zeros(shape, u32) for _ in range(W)]
    seq_a = [jnp.zeros(shape, i32) for _ in range(WP)]
    m = jnp.zeros(shape, i32)

    for i in range(L):  # static unroll: L is the bucket width
        a_i = a_rows[i]
        # strsim.rs:208 iterates only the first len_b + bound chars of a
        active = (i < la) & (i < lb + bound)
        lo = i - bound                      # window start (may be negative)
        hi = jnp.minimum(i + bound, lb - 1)  # window end (may be negative)

        found = jnp.zeros(shape, bool)
        for w in range(W):  # greedy: low word -> high
            # EqB word w for a_i, built from only the real b rows (bits at
            # j >= L don't exist; bits at len_b <= j < L are 0 because
            # PAD_B != any real char). i32 accumulate (Mosaic: no u32
            # reduce), bitcast after — bit patterns identical.
            eq_i = jnp.zeros(shape, i32)
            for j in range(w * _WORD, min((w + 1) * _WORD, L)):
                bit = np.int32(np.uint32(1) << np.uint32(j % _WORD))
                eq_i = eq_i | jnp.where(b_rows[j] == a_i, bit, np.int32(0))
            eqw = lax.bitcast_convert_type(eq_i, u32)
            # window bits lo..hi restricted to word w
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqw & ~flag[w] & win
            # greedy: only the lowest set bit across ALL words may flag;
            # suppress this word if a lower word already found / row inactive
            cand = jnp.where(active & ~found, cand, np.uint32(0))
            lsb = cand & (~cand + np.uint32(1))
            flag[w] = flag[w] | lsb
            found = found | (cand != 0)

        # rank-compact the matched a-char: slot m of seq_a (matched
        # a-chars arrive in increasing i — already rank order)
        v = jnp.where(found, a_i, 0)
        val = v if pack == 1 else v << ((m & (pack - 1)) << LOG_BITS)
        mw = m if pack == 1 else m >> LOG_PACK
        for wp in range(WP):
            seq_a[wp] = seq_a[wp] | jnp.where(mw == wp, val, 0)
        m = m + found.astype(i32)

    # rank-compact the flagged b-chars (increasing j = rank order,
    # strsim.rs:227-232), then count unequal slot pairs = t
    seq_b = [jnp.zeros(shape, i32) for _ in range(WP)]
    rb = jnp.zeros(shape, i32)
    for j in range(L):
        fb = (flag[j // _WORD] >> np.uint32(j % _WORD)) & np.uint32(1)
        fbit = fb != 0
        v = jnp.where(fbit, b_rows[j], 0)
        val = v if pack == 1 else v << ((rb & (pack - 1)) << LOG_BITS)
        rw = rb if pack == 1 else rb >> LOG_PACK
        for wp in range(WP):
            seq_b[wp] = seq_b[wp] | jnp.where(rw == wp, val, 0)
        rb = rb + fbit.astype(i32)

    t = _count_unequal_slots(seq_a, seq_b, pack, shape)

    m_ref[0] = m
    t_ref[0] = t


def _count_unequal_slots(seq_a, seq_b, pack: int, shape) -> Array:
    """t = number of compaction slots where the two rank-ordered matched-char
    sequences differ (strsim.rs:233-236). Unwritten slots are 0 on both sides
    (both sequences hold exactly m entries), so no rank mask is needed; slot
    equality == char equality because every char fits its slot."""
    i32 = jnp.int32
    bits = 32 // pack
    mask = (1 << bits) - 1
    t = jnp.zeros(shape, i32)
    for wp in range(len(seq_a)):
        x = seq_a[wp] ^ seq_b[wp]
        if pack == 1:
            t = t + (x != 0).astype(i32)
        else:
            for s in range(pack):
                t = t + (((x >> (bits * s)) & mask) != 0).astype(i32)
    return t


def _kernel_wide(a_ref, b_ref, la_ref, lb_ref, m_ref, t_ref, *, L: int, pack: int):
    """Wide-bucket variant (64 < L <= 512): identical fused design to
    _kernel, but the scan over a-positions and the b-side compaction pass
    are lax.fori_loops with stacked carried state (flag words [W, ...],
    slot-compacted sequences [WP, ...]), so the compiled body is
    O(3L + 20W + L/2) ops instead of an L-step unroll. Dynamic trip counts
    (max over the block of the reference's scan bounds) let short blocks in
    a wide bucket stop early."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    WP = -(-L // pack)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1

    flag0 = jnp.zeros((W,) + shape, u32)
    seqa0 = jnp.zeros((WP,) + shape, i32)
    m0 = jnp.zeros(shape, i32)

    def scan_body(i, state):
        flag, seq_a, m = state
        a_i = a_ref[0, i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        found = jnp.zeros(shape, bool)
        new_flag = []
        for w in range(W):
            eq_i = jnp.zeros(shape, i32)
            for j in range(w * _WORD, min((w + 1) * _WORD, L)):
                bit = np.int32(np.uint32(1) << np.uint32(j % _WORD))
                eq_i = eq_i | jnp.where(b_ref[0, j] == a_i, bit, np.int32(0))
            eqw = lax.bitcast_convert_type(eq_i, u32)
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqw & ~flag[w] & win
            cand = jnp.where(active & ~found, cand, np.uint32(0))
            lsb = cand & (~cand + np.uint32(1))
            new_flag.append(flag[w] | lsb)
            found = found | (cand != 0)
        flag = jnp.stack(new_flag)
        v = jnp.where(found, a_i, 0)
        val = v if pack == 1 else v << ((m & (pack - 1)) << LOG_BITS)
        mw = m if pack == 1 else m >> LOG_PACK
        wwp = lax.broadcasted_iota(i32, (WP,) + shape, 0)
        seq_a = seq_a | jnp.where(wwp == mw[None], val[None], 0)
        m = m + found.astype(i32)
        return flag, seq_a, m

    i_max = jnp.minimum(jnp.max(jnp.minimum(la, lb + bound)), L)
    flag, seq_a, m = lax.fori_loop(0, i_max, scan_body, (flag0, seqa0, m0))

    def compact_body(j, state):
        seq_b, rb = state
        jw = j // _WORD
        jb = (j % _WORD).astype(u32)
        fw = jnp.zeros(shape, u32)
        for w in range(W):
            fw = jnp.where(jw == w, flag[w], fw)
        fbit = ((fw >> jb) & 1) != 0
        v = jnp.where(fbit, b_ref[0, j], 0)
        val = v if pack == 1 else v << ((rb & (pack - 1)) << LOG_BITS)
        rw = rb if pack == 1 else rb >> LOG_PACK
        wwp = lax.broadcasted_iota(i32, (WP,) + shape, 0)
        seq_b = seq_b | jnp.where(wwp == rw[None], val[None], 0)
        rb = rb + fbit.astype(i32)
        return seq_b, rb

    j_max = jnp.minimum(jnp.max(lb), L)
    seq_b, _ = lax.fori_loop(
        0, j_max, compact_body,
        (jnp.zeros((WP,) + shape, i32), jnp.zeros(shape, i32)),
    )

    t = _count_unequal_slots(seq_a, seq_b, pack, shape)
    m_ref[0] = m
    t_ref[0] = t


def _block_rows_for(B: int, block_rows: int) -> int:
    br = min(block_rows, B)
    while B % br:
        br //= 2
    return br


def _wide_block_rows(L: int, pack: int = 4) -> int:
    """Measured winners (tools/ab_jaro_wide.py): 2048 rows at w95, 1024
    beyond (w511 at 2048 exceeds VMEM: two [L, BR] i32 tiles double-buffered
    + the [WP, BR] sequence state). Wider compaction slots (pack < 4) grow
    the sequence state 2x/4x, so halve rows per step below pack=4."""
    base = 2048 if L <= 96 else 1024
    return max(256, base // (4 // pack))


def jaro_match_stats_pallas_scan(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
    pack: Optional[int] = None,
) -> Tuple[Array, Array]:
    """(m, t): greedy match count and raw transposition count — drop-in for
    ops.jaro_bitmask.jaro_match_stats_bitmask.

    a, b: [B, L] padded codepoint tiles. `pack` = compacted chars per i32
    transposition word; every codepoint must fit a 32/pack-bit slot:
    pack=4 for int8/pure-ASCII tiles (default when the dtype is 8-bit),
    pack=2 when all codepoints < 2**16 (the BMP — the caller asserts this;
    the pipeline computes the bucket max while narrowing tiles), pack=1 for
    arbitrary codepoints. len_a, len_b: [B] int32. Returns two [B] int32
    arrays. interpret=None auto-selects the Pallas interpreter on non-TPU
    backends.
    """
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(
            f"jaro pallas_scan requires width <= {_MAX_WIDTH_WIDE}, got {L}"
        )
    if pack is None:
        if a.dtype.itemsize != 1 or b.dtype.itemsize != 1:
            raise ValueError(
                "jaro pallas_scan compacts matched chars into 32/pack-bit "
                f"slots: tiles of dtype {a.dtype}/{b.dtype} need an explicit "
                "pack (2 if all codepoints < 2**16 else 1); only 8-bit tiles "
                "default to pack=4"
            )
        pack = 4
    if pack not in (1, 2, 4):
        raise ValueError(f"pack must be 1, 2 or 4, got {pack}")
    if pack == 4 and (a.dtype.itemsize != 1 or b.dtype.itemsize != 1):
        raise ValueError(
            f"pack=4 byte-packs matched chars: tiles must be an 8-bit dtype "
            f"(got {a.dtype}/{b.dtype})"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32
    wide = L > _MAX_WIDTH
    if wide:
        block_rows = min(block_rows, _wide_block_rows(L, pack))
    elif pack < 4:
        # the unrolled kernel's live sequence state is 2*ceil(L/pack) words
        # per lane: keep the whole program VMEM-resident at wider slots
        block_rows = min(block_rows, 4096 if pack == 2 else 2048)

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        zi = jnp.zeros((pad_rows,), len_a.dtype)
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_B, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, zi])
        len_b = jnp.concatenate([len_b, zi])
        B = B + pad_rows

    BR = _block_rows_for(B, block_rows)
    BR8 = BR // _SUB
    G = B // BR

    aT = a.T.astype(i32)  # [L, B] batch-in-lanes, i32 (Mosaic: no int8 blocks)
    bT = b.T.astype(i32)
    a4 = aT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = bT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    def tile_spec(rows):
        return pl.BlockSpec(
            (1, rows, _SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    row_spec = pl.BlockSpec(
        (1, _SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )

    m3, t3 = pl.pallas_call(
        functools.partial(_kernel_wide if wide else _kernel, L=L, pack=pack),
        out_shape=(
            jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
            jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
        ),
        grid=(G,),
        in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
        out_specs=(row_spec, row_spec),
        interpret=interpret,
    )(a4, b4, la3, lb3)
    m = m3.reshape(B)
    t = t3.reshape(B)
    if pad_rows:
        m = m[: B - pad_rows]
        t = t[: B - pad_rows]
        B = B - pad_rows

    # len-1 vs len-1: direct char compare before any window math
    # (strsim.rs:197-199; bound = -1 makes the window empty in-kernel)
    la_r = len_a[:B].astype(i32)
    lb_r = len_b[:B].astype(i32)
    one_one = (la_r == 1) & (lb_r == 1)
    eq11 = aT[0, :B] == bT[0, :B]
    m = jnp.where(one_one, eq11.astype(i32), m)
    t = jnp.where(one_one, 0, t)
    return m, t
