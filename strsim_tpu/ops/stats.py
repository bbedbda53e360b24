"""Device kernels: integer sufficient statistics for all five measures (pure XLA).

Design: rather than computing f64 scores on device (TPU f64 is emulated and
slow), each kernel reduces a padded codepoint tile pair [B, L] to small integer
statistics — exact by construction — and the host finalizer (ops/finalize.py)
applies the reference's f64 formulas in the reference's evaluation order.
Integer stats + IEEE-identical host math ⇒ bit-for-float parity with the
reference (src/expressions/strsim.rs:160, 238-243, 260-267, 301-306, 337-343)
while the device does only int32/bool vector work.

Statistics per measure:
  levenshtein   → edit distance d                 (strsim.rs:146-159 semantics)
  jaro          → match count m, raw transpositions t  (strsim.rs:200-237)
  jaro_winkler  → m, t, shared prefix length ≤ 4  (strsim.rs:261-266)
  jaccard/dice  → character-multiset intersection Σ_c min(cnt_a, cnt_b)
                  (strsim.rs:297-306; denominators derive from lengths)

All kernels are batched over B row pairs and vectorize the per-row loops of the
reference into [B, L] lane operations; the only sequential dimensions are the
2L-1 anti-diagonals of the Levenshtein DP and the L greedy steps of the Jaro
match scan, both of which the reference also executes sequentially per row.

Inputs are padded with PAD_A = -1 (a side) and PAD_B = -2 (b side): pads never
equal each other or any real codepoint, so character-equality tests need no
masking (strsim_tpu/utils/encode.py).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array


def _shift_down(x: Array, fill) -> Array:
    """[W, B] → [W, B] with rows moved one down; row 0 = fill."""
    return jnp.concatenate(
        [jnp.full((1, x.shape[1]), fill, dtype=x.dtype), x[:-1, :]], axis=0
    )


# ---------------------------------------------------------------------------
# Levenshtein: anti-diagonal wavefront DP
# ---------------------------------------------------------------------------

def levenshtein_distance(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Array:
    """Unit-cost edit distance per row pair.

    Wavefront formulation: diag_d[i] = D[i][d-i] where D is the classic DP
    table (D[i][j] = distance between a[:i] and b[:j]). Each anti-diagonal is
    an elementwise min over two shifted copies of the previous diagonals — no
    intra-step dependence, so the whole batch advances one diagonal per step.
    2L-1 sequential steps total.

    Layout: batch-in-lanes. State lives as [L+1, B] with the batch on the
    minor (128-wide lane) axis — for small buckets (L+1 « 128) the row-major
    [B, L+1] layout would waste most of each vector register on padding.

    Valid for rows with len_a >= 1 and len_b >= 1 (len_a + len_b >= 2); rows
    involving an empty side are resolved exactly in the finalizer (distance =
    max(len_a, len_b)), matching strsim.rs:160's formula.
    """
    B, L = a.shape
    # int32 DP state: int16 was measured slower on TPU v5e (sublane tiling
    # and mixed-dtype conversion costs outweigh the bandwidth savings).
    sdt = jnp.int32
    BIG = jnp.asarray(2 * L + 5, sdt)
    one = jnp.asarray(1, sdt)

    # Diagonal d, DP row i needs b[d-i-1]. With b_rev = reverse(b) that is
    # ext[2L - d + i] where ext = [PAD_B * L | b_rev | PAD_B * L], so each step
    # reads one dynamic sublane slice of a precomputed [3L, B] array.
    b_rev = jnp.flip(b, axis=1)
    pad = jnp.full((B, L), PAD_B, dtype=a.dtype)
    ext = jnp.concatenate([pad, b_rev, pad], axis=1).T  # [3L, B]

    # Row i compares a[i-1]; row 0 is a boundary cell whose cost is ignored.
    a_sh = jnp.concatenate(
        [jnp.full((B, 1), PAD_A, dtype=a.dtype), a], axis=1
    ).T  # [L+1, B]

    ii = jnp.arange(L + 1, dtype=jnp.int32)[:, None]
    target_d = (len_a + len_b)[None, :]
    lane_a = ii == len_a[None, :]

    ones = jnp.ones((1, B), sdt)
    diag0 = jnp.where(ii == 0, 0, BIG).astype(sdt) * ones
    diag1 = jnp.where(ii <= 1, 1, BIG).astype(sdt) * ones

    zero = jnp.asarray(0, sdt)

    def one_diag(d, prev, prev2, acc):
        # no validity mask: not-yet-valid lanes (i > d) hold values >= BIG
        # from initialization and can only overestimate until the boundary
        # cells (lane 0 / lane d) reach them with exact values — the min
        # recurrence is self-correcting, and the capture below selects only
        # provably-valid lanes (i = len_a at d = len_a + len_b).
        bs = lax.dynamic_slice_in_dim(ext, 2 * L - d, L + 1, axis=0)
        cost = jnp.where(a_sh != bs, one, zero)
        new = jnp.minimum(
            jnp.minimum(_shift_down(prev, BIG) + one, prev + one),
            _shift_down(prev2, BIG) + cost,
        )
        hit = (target_d == d) & lane_a
        acc = acc + jnp.sum(jnp.where(hit, new, zero), axis=0, dtype=sdt)
        return new, acc

    # two diagonals per loop iteration (halves loop-carry reloads); the trip
    # count is DYNAMIC — no diagonal beyond the block's longest la+lb does any
    # work, so with length-sorted batches each block pays only its true
    # lengths, not the padded bucket width.
    def body2(k, state):
        prev, prev2, acc = state
        d = 2 * k + 2
        new1, acc = one_diag(d, prev, prev2, acc)
        new2, acc = one_diag(d + 1, new1, prev, acc)
        return new2, new1, acc

    d_max = jnp.max(len_a + len_b)  # last diagonal that can carry a capture
    n_pair_steps = jnp.maximum((d_max - 1) // 2, 0)
    prev, prev2, acc = lax.fori_loop(
        0, n_pair_steps, body2, (diag1, diag0, jnp.zeros((B,), sdt))
    )
    # if d_max is even, one trailing diagonal remains (d = d_max itself)
    last, acc_last = one_diag(2 * n_pair_steps + 2, prev, prev2, acc)
    acc = jnp.where(d_max % 2 == 0, acc_last, acc)
    return acc.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Jaro: greedy windowed matching + ordered transposition count
# ---------------------------------------------------------------------------

def jaro_match_stats(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Tuple[Array, Array]:
    """(m, t): greedy match count and raw transposition count (pre-halving).

    The reference's greedy scan (strsim.rs:208-219) walks a's chars in order
    and flags the FIRST unflagged equal b char inside the window
    [i-bound, i+bound] ∩ [0, len_b). The loop-carried state is the b-side flag
    vector; everything inside one step vectorizes across the batch and across
    b positions (window mask + equality + first-true select).

    Valid for rows where both sides are non-empty; empty rows yield m = 0.
    """
    B, L = a.shape
    bound = (jnp.maximum(len_a, len_b) // 2 - 1).astype(jnp.int32)
    aT = a.T  # [L, B] — batch-in-lanes (see levenshtein_distance)
    bT = b.T
    jj = jnp.arange(L, dtype=jnp.int32)[:, None]
    win_b = jj < len_b[None, :]

    def body(i, state):
        flagged_b, matched_a, m = state
        a_i = lax.dynamic_slice_in_dim(aT, i, 1, axis=0)  # [1, B]
        # strsim.rs:208 iterates only the first len_b + bound chars of a.
        active = (i < len_a) & (i < len_b + bound)
        win = (jj >= i - bound[None, :]) & (jj <= i + bound[None, :]) & win_b
        cand = (bT == a_i) & (~flagged_b) & win & active[None, :]
        found = jnp.any(cand, axis=0)
        first = jnp.argmax(cand, axis=0)  # index of first True
        flagged_b = flagged_b | ((jj == first[None, :]) & found[None, :])
        matched_a = jnp.where(jj == i, found[None, :], matched_a)
        m = m + found.astype(jnp.int32)
        return flagged_b, matched_a, m

    # dynamic trip count: no step beyond the block's longest active range does
    # any work (strsim.rs:208's take(len_b + bound) cap, maximized over rows)
    i_max = jnp.clip(jnp.max(jnp.minimum(len_a, len_b + bound)), 0, L)
    flagged_b, matched_a, m = lax.fori_loop(
        0,
        i_max,
        body,
        (
            jnp.zeros((L, B), bool),
            jnp.zeros((L, B), bool),
            jnp.zeros((B,), jnp.int32),
        ),
    )

    t = transposition_count(aT, bT, matched_a, flagged_b)

    # len-1 vs len-1 pairs: the reference compares the chars directly before
    # any window math (strsim.rs:197-199) — the greedy window is empty there
    # (bound = -1), so patch m for exactly that case (t is 0 either way).
    one_one = (len_a == 1) & (len_b == 1)
    eq11 = aT[0, :] == bT[0, :]
    m = jnp.where(one_one, (eq11).astype(jnp.int32), m)
    t = jnp.where(one_one, 0, t)
    return m, t


def transposition_count(
    aT: Array, bT: Array, matched_a: Array, flagged_b: Array
) -> Array:
    """Jaro transposition count (strsim.rs:220-237): the r-th matched a-char
    pairs with the r-th flagged b-char. Rather than compacting both sides
    (argsort is ~12x the cost of the whole match scan on TPU), count
    mismatches by rank: for each a-position i, its partner is the unique
    b-position j with rank_b[j] == rank_a[i]; accumulate (a_i != b_j) over an
    L-step scan with [L, B] working state. All inputs are [L, B]."""
    L = aT.shape[0]
    rank_a = jnp.cumsum(matched_a.astype(jnp.int32), axis=0) - 1
    rank_b = jnp.cumsum(flagged_b.astype(jnp.int32), axis=0) - 1

    def trans_body(i, t):
        a_i = lax.dynamic_slice_in_dim(aT, i, 1, axis=0)          # [1, B]
        ra_i = lax.dynamic_slice_in_dim(rank_a, i, 1, axis=0)     # [1, B]
        ma_i = lax.dynamic_slice_in_dim(matched_a, i, 1, axis=0)  # [1, B]
        hit = flagged_b & (rank_b == ra_i) & (bT != a_i)
        return t + jnp.sum(hit & ma_i, axis=0).astype(jnp.int32)

    # dynamic bound: steps beyond the last matched a-position contribute 0
    pos1 = jnp.arange(1, L + 1, dtype=jnp.int32)[:, None]
    i_max = jnp.max(jnp.where(matched_a, pos1, 0))
    return lax.fori_loop(0, i_max, trans_body, jnp.zeros((aT.shape[1],), jnp.int32))


def shared_prefix_length(a: Array, b: Array) -> Array:
    """Common prefix length capped at 4 chars (strsim.rs:261-266). Pads differ
    between sides so comparisons past either length are False automatically."""
    k = min(a.shape[1], 4)
    eq = (a[:, :k] == b[:, :k]).astype(jnp.int32)
    return jnp.sum(jnp.cumprod(eq, axis=1), axis=1)


# ---------------------------------------------------------------------------
# Jaccard / Sørensen-Dice: character-multiset intersection
# ---------------------------------------------------------------------------

def multiset_intersection(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Array:
    """Σ_c min(cnt_a(c), cnt_b(c)) per row, without histograms.

    Identity: the intersection size equals the number of positions i in a whose
    occurrence index (count of equal chars strictly before i in a) is below the
    total count of that char in b. Both counts come from [B, L, L] equality
    tables — pure VPU compare+reduce, no scatter, vocabulary-independent (works
    for arbitrary Unicode where a 1M-bin histogram would not fit).
    """
    del len_b  # pads encode b's validity
    aT = a.T  # [L, B] — batch-in-lanes
    bT = b.T
    L = aT.shape[0]
    # [L_i, L_j, B] equality tables, batch on the minor axis
    cnt_in_b = jnp.sum(aT[:, None, :] == bT[None, :, :], axis=1)  # [L, B]
    kk = jnp.arange(L, dtype=jnp.int32)
    before = (kk[None, :] < kk[:, None])[:, :, None]  # k strictly before i
    occ = jnp.sum((aT[:, None, :] == aT[None, :, :]) & before, axis=1)
    valid_i = kk[:, None] < len_a[None, :]
    return jnp.sum((occ < cnt_in_b) & valid_i, axis=0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused stats entry point
# ---------------------------------------------------------------------------

# jaro lists "prefix" too (though its finalizer ignores it): computing the
# 4-lane prefix compare alongside the match scan is free, and it makes jaro and
# jaro_winkler share one compiled kernel — remote TPU compiles are the scarce
# resource, not lanes.
STAT_FIELDS = {
    "levenshtein": ("lev_d",),
    "jaro": ("jaro_m", "jaro_t", "prefix"),
    "jaro_winkler": ("jaro_m", "jaro_t", "prefix"),
    "jaccard": ("inter",),
    "sorensen_dice": ("inter",),
    # extensions (not in the reference): bigram-multiset variants. They carry
    # a row-equality stat so the documented "equal -> 1.0" semantics hold for
    # length-1 equal pairs (which have no bigrams) regardless of whether the
    # pipeline's equal_fast_path is enabled.
    "jaccard_bigram": ("inter2", "eq"),
    "sorensen_dice_bigram": ("inter2", "eq"),
    # extensions over the char-multiset intersection stat (free when fused
    # with jaccard/dice) and two extension-only stats
    "cosine": ("inter",),
    "overlap": ("inter",),
    "hamming": ("ham_m",),
    "lcs_seq": ("lcs_len",),
    "indel": ("lcs_len",),
    "osa": ("osa_d",),
    # extension: soundex phonetic-code equality (ops/phonetic.py)
    "soundex": ("sdx_eq",),
}


def row_equal(a: Array, b: Array, len_a: Array, len_b: Array) -> Array:
    """1 where the rows are identical strings (pads differ per side, so
    positions past either length never compare equal)."""
    eq_cnt = jnp.sum((a == b).astype(jnp.int32), axis=1)
    return ((len_a == len_b) & (eq_cnt == len_a)).astype(jnp.int32)


def compute_stats(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    measures: Tuple[str, ...],
    impls: Tuple[Tuple[str, str], ...] = (),
) -> Dict[str, Array]:
    """Compute the union of integer stats needed by `measures` on one tile
    batch. Shared stats (jaro m/t for both jaro and jaro_winkler, intersection
    for jaccard and dice) are computed once — this is the fused-measure mode
    from BASELINE.json config 4.

    `impls`: optional (("levenshtein", "pallas"), ("jaro", "xla"), ...) kernel
    selection (hashable, jit-static); default "xla" for each family.
    """
    impl = dict(impls)
    need = set()
    for msr in measures:
        need.update(STAT_FIELDS[msr])
    out: Dict[str, Array] = {}
    _jaro_packs = {"pallas_scan": 4, "pallas_scan_h": 2, "pallas_scan_f": 1}
    if (
        "lev_d" in need
        and "jaro_m" in need
        and impl.get("levenshtein") == "pallas_scan"
        and impl.get("jaro") in _jaro_packs
    ):
        # fused-measure mode: lev's Eq and jaro's EqB are transposes of one
        # L x L equality matrix; the shared-equality kernel computes it once
        # and serves both recurrences (ops/lev_jaro_pallas.py — measured
        # 1.69-1.80x over the two separate kernels on v5e, FUSED_LJ_AB.json),
        # derives the multiset cnt_b by popcounting the stored EqB words
        # (only the occ half is computed fresh), and folds the 4-cap prefix
        # in for free. One or two flag words (w <= 63); the compaction slot
        # width follows the jaro impl's pack contract (byte for int8 tiles,
        # halfword for BMP int32, fullword for astral). Unsupported shapes
        # fall through to the separate kernels below.
        from strsim_tpu.ops import lev_jaro_pallas as ljp

        pack = _jaro_packs[impl.get("jaro")]
        if ljp.supports_width(a.shape[1]) and (
            pack != 4 or a.dtype.itemsize == 1
        ):
            with_inter = (
                "inter" in need and impl.get("multiset") == "pallas_scan"
            )
            with_prefix = "prefix" in need
            # osa/lcs consume the same transposed Eq words the Myers scan
            # does — riding this kernel's transpose beats a second kernel
            # rebuilding the structure (the all-14 serving mode)
            with_osa = "osa_d" in need and impl.get("osa") == "pallas_scan"
            with_lcs = "lcs_len" in need and impl.get("lcs") == "pallas_scan"
            res = ljp.fused_stats_pallas(
                a, b, len_a, len_b,
                with_inter=with_inter, with_prefix=with_prefix,
                with_osa=with_osa, with_lcs=with_lcs, pack=pack,
            )
            out["lev_d"], out["jaro_m"], out["jaro_t"] = res[:3]
            k = 3
            if with_inter:
                out["inter"] = res[k]
                k += 1
            if with_prefix:
                out["prefix"] = res[k]
                k += 1
            if with_osa:
                out["osa_d"] = res[k]
                k += 1
            if with_lcs:
                out["lcs_len"] = res[k]
    # same-orientation fused DP (ROOFLINE headroom #7): lev/osa/lcs consume
    # IDENTICAL per-text-position Eq words — one build serves every
    # requested recurrence (ops/dp_fused_pallas.py). Taken when >= 2 of the
    # three want it (lev only if the shared-equality kernel above didn't
    # already produce it), or for lcs alone (its first Pallas path).
    dp_want = []
    if (
        "lev_d" in need
        and "lev_d" not in out
        and impl.get("levenshtein") == "pallas_scan"
    ):
        dp_want.append("lev")
    if (
        "osa_d" in need
        and "osa_d" not in out
        and impl.get("osa") == "pallas_scan"
    ):
        dp_want.append("osa")
    if (
        "lcs_len" in need
        and "lcs_len" not in out
        and impl.get("lcs") == "pallas_scan"
    ):
        dp_want.append("lcs")
    if len(dp_want) >= 2 or dp_want == ["lcs"]:
        from strsim_tpu.ops import dp_fused_pallas as dpf

        if dpf.supports_width(a.shape[1]):
            res = dpf.dp_fused_stats_pallas(
                a, b, len_a, len_b,
                with_lev="lev" in dp_want,
                with_osa="osa" in dp_want,
                with_lcs="lcs" in dp_want,
            )
            k = 0
            if "lev" in dp_want:
                out["lev_d"] = res[k]
                k += 1
            if "osa" in dp_want:
                out["osa_d"] = res[k]
                k += 1
            if "lcs" in dp_want:
                out["lcs_len"] = res[k]
    if "lev_d" in need and "lev_d" not in out:
        lev_impl = impl.get("levenshtein", "myers")
        if lev_impl == "pallas_scan":
            from strsim_tpu.ops import levenshtein_pallas_scan as lps

            if not lps.supports_width(a.shape[1]):
                # forced selection on a wider-than-W=1 bucket: same-contract
                # XLA kernel (pipeline "auto" never routes such widths here)
                from strsim_tpu.ops.levenshtein_myers import (
                    levenshtein_distance_myers,
                )

                out["lev_d"] = levenshtein_distance_myers(a, b, len_a, len_b)
            else:
                out["lev_d"] = lps.levenshtein_distance_myers_pallas(
                    a, b, len_a, len_b
                )
        elif lev_impl == "pallas":
            from strsim_tpu.ops.levenshtein_pallas import levenshtein_distance_pallas

            out["lev_d"] = levenshtein_distance_pallas(a, b, len_a, len_b)
        elif lev_impl == "wavefront":
            out["lev_d"] = levenshtein_distance(a, b, len_a, len_b)
        else:  # "myers" (default) — bit-parallel column DP
            from strsim_tpu.ops.levenshtein_myers import levenshtein_distance_myers

            out["lev_d"] = levenshtein_distance_myers(a, b, len_a, len_b)
    if "jaro_m" in need and "jaro_m" not in out:
        jaro_impl = impl.get("jaro", "bitmask")
        if jaro_impl == "pallas_scan":
            from strsim_tpu.ops import jaro_pallas_scan as jps

            if not jps.supports_width(a.shape[1]) or a.dtype.itemsize != 1:
                # forced selection outside the kernel's contract (wide bucket
                # or wide-codepoint tiles): same-contract XLA kernel
                from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask

                out["jaro_m"], out["jaro_t"] = jaro_match_stats_bitmask(
                    a, b, len_a, len_b
                )
            else:
                out["jaro_m"], out["jaro_t"] = jps.jaro_match_stats_pallas_scan(
                    a, b, len_a, len_b
                )
        elif jaro_impl in ("pallas_scan_h", "pallas_scan_f"):
            # fused kernel on wide-codepoint (int32) tiles: halfword
            # compaction when the bucket's max codepoint fits 16 bits
            # (pipeline._narrow_bucket measured it), full-word beyond.
            # CONTRACT (forced selection only): "pallas_scan_h" packs two
            # codepoints per 32-bit slot — a codepoint >= 2^16 silently
            # overflows into the adjacent slot and corrupts the transposition
            # count. Auto routing is safe (gated on the bucket's measured
            # max_char in pipeline._jaro_impl_for); forcing
            # jaro_impl="pallas_scan_h" on astral-codepoint tiles is on the
            # caller. STRSIM_DEBUG_PACK_CONTRACT=1 adds a host-side check.
            from strsim_tpu.ops import jaro_pallas_scan as jps

            if not jps.supports_width(a.shape[1]):
                from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask

                out["jaro_m"], out["jaro_t"] = jaro_match_stats_bitmask(
                    a, b, len_a, len_b
                )
            else:
                out["jaro_m"], out["jaro_t"] = jps.jaro_match_stats_pallas_scan(
                    a, b, len_a, len_b,
                    pack=2 if jaro_impl == "pallas_scan_h" else 1,
                )
        elif jaro_impl == "pallas":
            from strsim_tpu.ops.jaro_pallas import jaro_match_stats_pallas

            out["jaro_m"], out["jaro_t"] = jaro_match_stats_pallas(a, b, len_a, len_b)
        elif jaro_impl == "scan":
            out["jaro_m"], out["jaro_t"] = jaro_match_stats(a, b, len_a, len_b)
        else:  # "bitmask" (default) — packed-flag greedy scan
            from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask

            out["jaro_m"], out["jaro_t"] = jaro_match_stats_bitmask(a, b, len_a, len_b)
    if "prefix" in need and "prefix" not in out:
        out["prefix"] = shared_prefix_length(a, b)
    if "inter" in need and "inter" not in out:
        ms_impl = impl.get("multiset", "chunked")
        if ms_impl == "pallas_scan":
            from strsim_tpu.ops import multiset_pallas as msp

            if not msp.supports_width(a.shape[1]):
                from strsim_tpu.ops.multiset_loop import (
                    multiset_intersection_chunked,
                )

                out["inter"] = multiset_intersection_chunked(a, b, len_a, len_b)
            else:
                out["inter"] = msp.multiset_intersection_pallas(a, b, len_a, len_b)
        elif ms_impl == "pallas_hist":
            from strsim_tpu.ops import multiset_pallas as msp

            if a.dtype.itemsize != 1:
                # forced selection outside the kernel's contract
                from strsim_tpu.ops.multiset_loop import (
                    multiset_intersection_chunked,
                )

                out["inter"] = multiset_intersection_chunked(a, b, len_a, len_b)
            else:
                out["inter"] = msp.multiset_intersection_hist(a, b, len_a, len_b)
        elif ms_impl == "table":
            out["inter"] = multiset_intersection(a, b, len_a, len_b)
        elif ms_impl == "xla":  # streaming 1-position-per-step scan
            from strsim_tpu.ops.multiset_loop import multiset_intersection_loop

            out["inter"] = multiset_intersection_loop(a, b, len_a, len_b)
        else:  # "chunked" (default): G positions per fused compare-reduce
            from strsim_tpu.ops.multiset_loop import (
                multiset_intersection_chunked,
            )

            out["inter"] = multiset_intersection_chunked(a, b, len_a, len_b)
    if "inter2" in need:
        bg_impl = impl.get("bigram", "xla")
        if bg_impl == "pallas_scan":
            from strsim_tpu.ops import bigram_pallas as bgp

            if bgp.supports_width(a.shape[1]):
                i2, ham, eqv = bgp.bigram_stats_pallas(a, b, len_a, len_b)
                out["inter2"] = i2
                # the kernel's ham/eq side products serve those stats too
                # (identical contracts to the XLA forms below)
                if "ham_m" in need:
                    out["ham_m"] = ham
                if "eq" in need:
                    out["eq"] = eqv
            else:
                from strsim_tpu.ops.multiset_loop import (
                    bigram_intersection_loop,
                )

                out["inter2"] = bigram_intersection_loop(a, b, len_a, len_b)
        else:
            from strsim_tpu.ops.multiset_loop import bigram_intersection_loop

            out["inter2"] = bigram_intersection_loop(a, b, len_a, len_b)
    if "ham_m" in need and "ham_m" not in out:
        # positional matches; pads differ per side, so positions past either
        # length never compare equal (EXTENSION: hamming)
        out["ham_m"] = jnp.sum((a == b).astype(jnp.int32), axis=1)
    if "lcs_len" in need and "lcs_len" not in out:
        from strsim_tpu.ops.lcs import lcs_length

        out["lcs_len"] = lcs_length(a, b, len_a, len_b)
    if "osa_d" in need and "osa_d" not in out:
        osa_impl = impl.get("osa", "myers")
        if osa_impl == "pallas_scan":
            from strsim_tpu.ops import osa_pallas_scan as ops

            if not ops.supports_width(a.shape[1]):
                from strsim_tpu.ops.osa_myers import osa_distance_myers

                out["osa_d"] = osa_distance_myers(a, b, len_a, len_b)
            else:
                out["osa_d"] = ops.osa_distance_pallas(a, b, len_a, len_b)
        else:  # "myers" (default) — XLA bit-parallel Hyyrö kernel
            from strsim_tpu.ops.osa_myers import osa_distance_myers

            out["osa_d"] = osa_distance_myers(a, b, len_a, len_b)
    if "sdx_eq" in need:
        from strsim_tpu.ops.phonetic import soundex_equal

        out["sdx_eq"] = soundex_equal(a, b, len_a, len_b)
    if "eq" in need and "eq" not in out:
        out["eq"] = row_equal(a, b, len_a, len_b)
    return out


@functools.partial(jax.jit, static_argnames=("measures",))
def compute_stats_jit(a, b, len_a, len_b, measures: Tuple[str, ...]):
    return compute_stats(a, b, len_a, len_b, measures)
