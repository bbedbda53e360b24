"""Pallas kernels in interpret mode (CPU CI) vs the trusted oracle."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from strsim_tpu.ops import oracle
from strsim_tpu.ops.levenshtein_pallas import levenshtein_distance_pallas
from strsim_tpu.utils import encode as enc


def _tiles(pairs, width):
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=width)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=width)
    return (
        jnp.asarray(a.codes),
        jnp.asarray(b.codes),
        jnp.asarray(a.lengths),
        jnp.asarray(b.lengths),
    )


def test_pallas_levenshtein_golden(golden):
    pairs = [(a, b) for a, b, _ in golden["levenshtein"] if a and b]
    ca, cb, la, lb = _tiles(pairs, width=32)
    d = np.asarray(levenshtein_distance_pallas(ca, cb, la, lb, interpret=True))
    want = np.array([oracle.levenshtein_distance(a, b) for a, b in pairs])
    np.testing.assert_array_equal(d, want)


def test_pallas_levenshtein_fuzz():
    rng = random.Random(99)
    pairs = []
    for _ in range(300):
        la = rng.randrange(1, 9)
        lb = rng.randrange(1, 9)
        pairs.append(
            (
                "".join(rng.choice("abc") for _ in range(la)),
                "".join(rng.choice("abc") for _ in range(lb)),
            )
        )
    ca, cb, la, lb = _tiles(pairs, width=8)
    d = np.asarray(levenshtein_distance_pallas(ca, cb, la, lb, interpret=True))
    want = np.array([oracle.levenshtein_distance(a, b) for a, b in pairs])
    np.testing.assert_array_equal(d, want)


def test_pallas_jaro_golden(golden):
    from strsim_tpu.ops.jaro_pallas import jaro_match_stats_pallas

    pairs = [
        (a, b)
        for a, b, _ in golden["jaro"]
        if a and b and not (len(a) == 1 and len(b) == 1)
    ]
    ca, cb, la, lb = _tiles(pairs, width=32)
    m, t = jaro_match_stats_pallas(ca, cb, la, lb, interpret=True)
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    np.testing.assert_array_equal(np.asarray(m), np.array([w[0] for w in want]))
    np.testing.assert_array_equal(np.asarray(t), np.array([w[1] for w in want]))


def test_pallas_jaro_fuzz():
    from strsim_tpu.ops.jaro_pallas import jaro_match_stats_pallas

    rng = random.Random(5)
    pairs = []
    for _ in range(300):
        la = rng.randrange(1, 9)
        lb = rng.randrange(1, 9)
        pairs.append(
            (
                "".join(rng.choice("ab") for _ in range(la)),
                "".join(rng.choice("ab") for _ in range(lb)),
            )
        )
    pairs = [(a, b) for a, b in pairs if not (len(a) == 1 and len(b) == 1)]
    ca, cb, la, lb = _tiles(pairs, width=8)
    m, t = jaro_match_stats_pallas(ca, cb, la, lb, interpret=True)
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    np.testing.assert_array_equal(np.asarray(m), np.array([w[0] for w in want]))
    np.testing.assert_array_equal(np.asarray(t), np.array([w[1] for w in want]))


# --- production W=1 Myers scan kernel (ops/levenshtein_pallas_scan.py) ---


def test_pallas_scan_golden(golden):
    from strsim_tpu.ops.levenshtein_pallas_scan import (
        levenshtein_distance_myers_pallas,
    )

    pairs = [(a, b) for a, b, _ in golden["levenshtein"] if a and b]
    ca, cb, la, lb = _tiles(pairs, width=31)
    d = np.asarray(
        levenshtein_distance_myers_pallas(ca, cb, la, lb, interpret=True)
    )
    want = np.array([oracle.levenshtein_distance(a, b) for a, b in pairs])
    np.testing.assert_array_equal(d, want)


@pytest.mark.parametrize("width", [7, 15, 23, 31])
def test_pallas_scan_fuzz_matches_xla_myers(width):
    """Bit-exact agreement with the XLA Myers kernel on the W=1 width
    bands, empty sides, equal pairs, and a batch not divisible by 8.
    The W=2 multiword variant (widths 33-64) is NOT interpretable in CI
    time (XLA:CPU chokes on the 47/63-step unrolled bodies); it is
    TPU-only in production ("auto" never selects it off-TPU) and is held
    to 262K-row bit-exact parity vs the XLA kernel on real TPU — numbers
    and date in the module docstring."""
    from strsim_tpu.ops.levenshtein_myers import levenshtein_distance_myers
    from strsim_tpu.ops.levenshtein_pallas_scan import (
        levenshtein_distance_myers_pallas,
    )

    rng = random.Random(width)
    pairs = []
    for i in range(203):  # odd count: exercises the sublane pad path
        la = rng.randrange(0, width + 1)
        lb = rng.randrange(0, width + 1)
        a = "".join(rng.choice("abcd") for _ in range(la))
        b = "".join(rng.choice("abcd") for _ in range(lb))
        if i % 11 == 0:
            b = a
        pairs.append((a, b))
    ca, cb, la, lb = _tiles(pairs, width=width)
    got = np.asarray(
        levenshtein_distance_myers_pallas(ca, cb, la, lb, interpret=True)
    )
    want = np.asarray(levenshtein_distance_myers(ca, cb, la, lb))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [7, 15, 23, 31])
def test_pallas_osa_scan_fuzz_matches_xla(width):
    """Pallas OSA scan vs the XLA Hyyrö kernel on the W=1 width bands —
    incl. adjacent-swap pairs (the TR vector), empty sides, equal pairs, and
    a batch not divisible by 8. The W=2 multiword variant has the same
    interpret limitation as the levenshtein scan (see above); its
    correctness evidence is the 262K-row bit-exact TPU parity run in
    tools/ab_osa_pallas.py."""
    from strsim_tpu.ops.osa_myers import osa_distance_myers
    from strsim_tpu.ops.osa_pallas_scan import osa_distance_pallas

    rng = random.Random(width * 3 + 1)
    pairs = []
    for i in range(203):  # odd count: exercises the sublane pad path
        la = rng.randrange(0, width + 1)
        lb = rng.randrange(0, width + 1)
        a = "".join(rng.choice("abcd") for _ in range(la))
        b = "".join(rng.choice("abcd") for _ in range(lb))
        if i % 11 == 0:
            b = a
        if i % 13 == 0 and len(a) > 2:  # adjacent transposition rows
            k = rng.randrange(len(a) - 1)
            b = a[:k] + a[k + 1] + a[k] + a[k + 2:]
        pairs.append((a, b))
    ca, cb, la, lb = _tiles(pairs, width=width)
    got = np.asarray(osa_distance_pallas(ca, cb, la, lb, interpret=True))
    want = np.asarray(osa_distance_myers(ca, cb, la, lb))
    np.testing.assert_array_equal(got, want)


def _wide_pairs(width, seed, swaps=False):
    """Random pairs spanning a wide bucket: long rows near the width, short
    rows, empties, equals, and (optionally) adjacent transpositions."""
    rng = random.Random(seed)
    pairs = []
    for i in range(67):  # odd count: exercises the sublane pad path
        la = rng.choice([0, 1, width // 3, width - 1, width, rng.randrange(1, width + 1)])
        lb = rng.choice([0, 1, width // 2, width, rng.randrange(1, width + 1)])
        a = "".join(rng.choice("abcd") for _ in range(la))
        b = "".join(rng.choice("abcd") for _ in range(lb))
        if i % 11 == 0:
            b = a
        if swaps and i % 13 == 0 and len(a) > 2:
            k = rng.randrange(len(a) - 1)
            b = a[:k] + a[k + 1] + a[k] + a[k + 2:]
        pairs.append((a, b))
    return pairs


@pytest.mark.parametrize("width", [95, 255, 511])
def test_pallas_scan_wide_fuzz_matches_xla_myers(width):
    """fori_loop wide kernel (W = 3..16, per-block dynamic trips) vs the XLA
    Myers kernel across the 95..511 ladder tail. Interpretable in CI time
    because the wide body compiles once (no full unroll)."""
    from strsim_tpu.ops.levenshtein_myers import levenshtein_distance_myers
    from strsim_tpu.ops.levenshtein_pallas_scan import (
        levenshtein_distance_myers_pallas,
    )

    ca, cb, la, lb = _tiles(_wide_pairs(width, seed=width), width=width)
    got = np.asarray(
        levenshtein_distance_myers_pallas(ca, cb, la, lb, interpret=True)
    )
    want = np.asarray(levenshtein_distance_myers(ca, cb, la, lb))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [95, 511])
def test_pallas_osa_scan_wide_fuzz_matches_xla(width):
    from strsim_tpu.ops.osa_myers import osa_distance_myers
    from strsim_tpu.ops.osa_pallas_scan import osa_distance_pallas

    ca, cb, la, lb = _tiles(_wide_pairs(width, seed=width * 7, swaps=True), width=width)
    got = np.asarray(osa_distance_pallas(ca, cb, la, lb, interpret=True))
    want = np.asarray(osa_distance_myers(ca, cb, la, lb))
    np.testing.assert_array_equal(got, want)


def test_pallas_osa_scan_rejects_beyond_ladder():
    from strsim_tpu.ops.osa_pallas_scan import osa_distance_pallas, supports_width

    assert supports_width(64) and supports_width(511) and not supports_width(513)
    ca, cb, la, lb = _tiles([("abc", "abd")] * 8, width=640)
    with pytest.raises(ValueError):
        osa_distance_pallas(ca, cb, la, lb, interpret=True)


def test_pallas_scan_rejects_beyond_ladder():
    from strsim_tpu.ops.levenshtein_pallas_scan import (
        levenshtein_distance_myers_pallas,
        supports_width,
    )

    assert supports_width(32) and supports_width(511) and not supports_width(513)
    ca, cb, la, lb = _tiles([("abc", "abd")] * 8, width=640)
    with pytest.raises(ValueError):
        levenshtein_distance_myers_pallas(ca, cb, la, lb, interpret=True)


# --- fused jaro kernel (ops/jaro_pallas_scan.py) ---


def _byte_tiles(pairs, width):
    """int8 tiles (the fused jaro kernel's contract — pure-ASCII buckets)."""
    ca, cb, la, lb = _tiles(pairs, width)
    return ca.astype(jnp.int8), cb.astype(jnp.int8), la, lb


def test_pallas_jaro_fused_golden(golden):
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    # len-1/len-1 excluded: oracle.jaro_stats has no strsim.rs:197-199
    # special case (kernels patch it; the fuzz test below covers it vs the
    # bitmask kernel, and the end-to-end suites cover the final scores)
    pairs = [
        (a, b)
        for a, b, _ in golden["jaro"]
        if a and b and not (len(a) == 1 and len(b) == 1)
    ]
    ca, cb, la, lb = _byte_tiles(pairs, width=31)
    m, t = jaro_match_stats_pallas_scan(ca, cb, la, lb, interpret=True)
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    np.testing.assert_array_equal(np.asarray(m), np.array([w[0] for w in want]))
    np.testing.assert_array_equal(np.asarray(t), np.array([w[1] for w in want]))


@pytest.mark.parametrize("width", [7, 15])
def test_pallas_jaro_fused_fuzz_matches_bitmask(width):
    """Bit-exact agreement with the XLA bitmask kernel — tight alphabet so
    transpositions, repeated chars, and greedy-order ties are dense; incl.
    empty sides, equal pairs, len-1 pairs, and a batch not divisible by 8.
    Widths 23-63 are held to 262K-row bit-exact parity vs the bitmask kernel
    on real TPU (tools/ab_jaro_fused.py) — the fully-unrolled interpret
    programs there are too slow for CI."""
    from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    rng = random.Random(width * 13)
    pairs = []
    for i in range(203):
        la = rng.randrange(0, width + 1)
        lb = rng.randrange(0, width + 1)
        a = "".join(rng.choice("ab") for _ in range(la))
        b = "".join(rng.choice("ab") for _ in range(lb))
        if i % 11 == 0:
            b = a
        pairs.append((a, b))
    ca, cb, la, lb = _byte_tiles(pairs, width=width)
    m1, t1 = jaro_match_stats_pallas_scan(ca, cb, la, lb, interpret=True)
    m0, t0 = jaro_match_stats_bitmask(ca, cb, la, lb)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


@pytest.mark.parametrize("width", [95, 255])
def test_pallas_jaro_wide_fuzz_matches_bitmask(width):
    """fori_loop wide fused jaro (65..512) vs the XLA bitmask kernel —
    interpretable in CI because the wide body compiles once (no unroll)."""
    from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    ca, cb, la, lb = _byte_tiles(_wide_pairs(width, seed=width * 3), width=width)
    m1, t1 = jaro_match_stats_pallas_scan(ca, cb, la, lb, interpret=True)
    m0, t0 = jaro_match_stats_bitmask(ca, cb, la, lb)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


@pytest.mark.parametrize("width", [95, 255, 511])
def test_pallas_multiset_hist_fuzz_matches_chunked(width):
    """Dynamic-range histogram multiset kernel (wide int8 buckets) vs the
    chunked XLA scan."""
    from strsim_tpu.ops.multiset_loop import multiset_intersection_chunked
    from strsim_tpu.ops.multiset_pallas import multiset_intersection_hist

    ca, cb, la, lb = _byte_tiles(_wide_pairs(width, seed=width * 5), width=width)
    got = np.asarray(multiset_intersection_hist(ca, cb, la, lb, interpret=True))
    want = np.asarray(multiset_intersection_chunked(ca, cb, la, lb))
    np.testing.assert_array_equal(got, want)


def test_pallas_multiset_hist_rejects_int32():
    from strsim_tpu.ops.multiset_pallas import multiset_intersection_hist

    ca, cb, la, lb = _tiles([("abc", "abd")] * 8, width=95)
    with pytest.raises(ValueError):
        multiset_intersection_hist(
            ca.astype(jnp.int32), cb.astype(jnp.int32), la, lb, interpret=True
        )


def _unicode_pairs(width, seed, alphabet):
    """Dense-match unicode pairs over a tight alphabet, incl. empty sides,
    equal pairs, and len-1 pairs — the same greedy-tie stress as the ASCII
    fuzz, but with codepoints that cannot byte-pack."""
    rng = random.Random(seed)
    pairs = []
    for i in range(203):
        la = rng.randrange(0, width + 1)
        lb = rng.randrange(0, width + 1)
        a = "".join(rng.choice(alphabet) for _ in range(la))
        b = "".join(rng.choice(alphabet) for _ in range(lb))
        if i % 11 == 0:
            b = a
        pairs.append((a, b))
    return pairs


@pytest.mark.parametrize("width", [7, 15])
def test_pallas_jaro_fused_unicode_pack2_matches_bitmask(width):
    """Halfword compaction (pack=2) on int32 BMP tiles vs the XLA bitmask
    kernel — bit-exact m/t, incl. codepoints near the 16-bit slot boundary."""
    from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    # Cyrillic + CJK + U+FFFD: all BMP, some above 0x7FFF (sign bit of the
    # packed halfword) to catch arithmetic-shift bugs in the t-count
    pairs = _unicode_pairs(width, seed=width * 17, alphabet="аб你好�")
    ca, cb, la, lb = _tiles(pairs, width=width)
    assert ca.dtype == jnp.int32
    m1, t1 = jaro_match_stats_pallas_scan(ca, cb, la, lb, pack=2, interpret=True)
    m0, t0 = jaro_match_stats_bitmask(ca, cb, la, lb)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_pallas_jaro_fused_unicode_pack1_matches_bitmask():
    """Full-word compaction (pack=1) with astral-plane codepoints (emoji are
    > 0xFFFF, so halfword slots would alias them)."""
    from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    pairs = _unicode_pairs(15, seed=31, alphabet="😀😁б\U0010FFFDx")
    ca, cb, la, lb = _tiles(pairs, width=15)
    assert ca.dtype == jnp.int32
    m1, t1 = jaro_match_stats_pallas_scan(ca, cb, la, lb, pack=1, interpret=True)
    m0, t0 = jaro_match_stats_bitmask(ca, cb, la, lb)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_pallas_jaro_wide_unicode_pack2_matches_bitmask():
    """fori_loop wide fused jaro on int32 BMP tiles (pack=2) vs the XLA
    bitmask kernel."""
    from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    width = 95
    pairs = _unicode_pairs(width, seed=width, alphabet="аб你�")
    ca, cb, la, lb = _tiles(pairs, width=width)
    assert ca.dtype == jnp.int32
    m1, t1 = jaro_match_stats_pallas_scan(ca, cb, la, lb, pack=2, interpret=True)
    m0, t0 = jaro_match_stats_bitmask(ca, cb, la, lb)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_pallas_jaro_fused_pack_contract():
    from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan

    ca, cb, la, lb = _tiles([("abc", "abd")] * 8, width=8)
    ca32, cb32 = ca.astype(jnp.int32), cb.astype(jnp.int32)
    with pytest.raises(ValueError):  # pack=4 demands 8-bit tiles
        jaro_match_stats_pallas_scan(ca32, cb32, la, lb, pack=4, interpret=True)
    with pytest.raises(ValueError):  # only 1/2/4 are slot widths
        jaro_match_stats_pallas_scan(ca32, cb32, la, lb, pack=3, interpret=True)


def test_pallas_jaro_fused_rejects_beyond_ladder_and_int32():
    from strsim_tpu.ops.jaro_pallas_scan import (
        jaro_match_stats_pallas_scan,
        supports_width,
    )

    assert supports_width(64) and supports_width(511) and not supports_width(513)
    ca, cb, la, lb = _byte_tiles([("abc", "abd")] * 8, width=640)
    with pytest.raises(ValueError):
        jaro_match_stats_pallas_scan(ca, cb, la, lb, interpret=True)
    ca, cb, la, lb = _tiles([("abc", "abd")] * 8, width=8)
    with pytest.raises(ValueError):
        jaro_match_stats_pallas_scan(
            ca.astype(jnp.int32), cb.astype(jnp.int32), la, lb, interpret=True
        )


# --- production multiset kernel (ops/multiset_pallas.py) ---


def test_pallas_multiset_golden(golden):
    from strsim_tpu.ops.multiset_pallas import multiset_intersection_pallas

    pairs = [(a, b) for a, b, _ in golden["jaccard"] if a and b]
    ca, cb, la, lb = _tiles(pairs, width=31)
    got = np.asarray(
        multiset_intersection_pallas(ca, cb, la, lb, interpret=True)
    )
    want = np.array([oracle.multiset_intersection(a, b) for a, b in pairs])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [7, 15, 23, 31])
def test_pallas_multiset_fuzz_matches_chunked(width):
    """Widths 33-64 are covered by 262K-row bit-exact parity vs the XLA
    kernel on real TPU (module docstring) — the interpreter is too slow
    for their unrolled bodies in CI."""
    from strsim_tpu.ops.multiset_loop import multiset_intersection_chunked
    from strsim_tpu.ops.multiset_pallas import multiset_intersection_pallas

    rng = random.Random(width * 31)
    pairs = []
    for i in range(203):  # odd count: exercises the sublane pad path
        la = rng.randrange(0, width + 1)
        lb = rng.randrange(0, width + 1)
        a = "".join(rng.choice("abc") for _ in range(la))
        b = "".join(rng.choice("abc") for _ in range(lb))
        if i % 11 == 0:
            b = a
        pairs.append((a, b))
    ca, cb, la, lb = _tiles(pairs, width=width)
    got = np.asarray(
        multiset_intersection_pallas(ca, cb, la, lb, interpret=True)
    )
    want = np.asarray(multiset_intersection_chunked(ca, cb, la, lb))
    np.testing.assert_array_equal(got, want)


def test_pallas_multiset_rejects_wide():
    from strsim_tpu.ops.multiset_pallas import (
        multiset_intersection_pallas,
        supports_width,
    )

    assert supports_width(63) and not supports_width(65)
    ca, cb, la, lb = _tiles([("abc", "abd")] * 8, width=95)
    with pytest.raises(ValueError):
        multiset_intersection_pallas(ca, cb, la, lb, interpret=True)


def test_fused_lev_jaro_kernel_parity():
    """Shared-equality fused lev+jaro kernel (round 4): bit-exact vs the two
    separate production kernels and the oracle, incl. len-1 pairs, empties,
    and the greedy-window edge cases, at both transpose tile sizes."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops import lev_jaro_pallas as ljp
    from strsim_tpu.ops import oracle
    from strsim_tpu.utils import encode as enc

    rng = np.random.default_rng(20260820)
    for width in (15, 31):
        n = 64
        cols = []
        for _ in range(2):
            out = []
            for _ in range(n):
                ln = int(rng.integers(0, width + 1))
                out.append("".join(chr(97 + int(c)) for c in rng.integers(0, 5, ln)))
            cols.append(out)
        # pin the special cases
        cols[0][:6] = ["", "", "a", "a", "b", "ab"]
        cols[1][:6] = ["", "x", "a", "b", "b", "ba"]
        a = enc.encode_column(cols[0], pad=enc.PAD_A, width=width)
        b = enc.encode_column(cols[1], pad=enc.PAD_B, width=width)
        args = (jnp.asarray(a.codes), jnp.asarray(b.codes),
                jnp.asarray(a.lengths), jnp.asarray(b.lengths))
        lev, m, t = ljp.lev_jaro_stats_pallas(*args)
        # oracle parity on IN-CONTRACT rows (the pipeline resolves empty
        # sides host-side before any kernel; kernels never see len 0)
        for i in range(n):
            x, y = cols[0][i], cols[1][i]
            if not x or not y:
                continue
            want_lev = oracle.levenshtein_distance(x, y)
            assert int(lev[i]) == want_lev, (width, i, x, y)
            if len(x) == 1 and len(y) == 1:
                # kernels use the direct-compare stats convention here
                # (m = eq, t = 0) — score-equivalent to the oracle's
                # len-1 shortcut; covered by the separate-kernel check
                continue
            want_m, want_t = oracle.jaro_stats(x, y)
            assert int(m[i]) == want_m, (width, i, x, y)
            assert int(t[i]) == want_t, (width, i, x, y)
        # contract-equivalence with the separate production kernels on ALL
        # rows, empties included (both are off-oracle there in the same way)
        from strsim_tpu.ops.jaro_pallas_scan import jaro_match_stats_pallas_scan
        from strsim_tpu.ops.levenshtein_pallas_scan import (
            levenshtein_distance_myers_pallas,
        )

        sep_lev = levenshtein_distance_myers_pallas(*args)
        sep_m, sep_t = jaro_match_stats_pallas_scan(*args)
        assert np.asarray(lev).tolist() == np.asarray(sep_lev).tolist(), width
        assert np.asarray(m).tolist() == np.asarray(sep_m).tolist(), width
        assert np.asarray(t).tolist() == np.asarray(sep_t).tolist(), width


def test_fused_lev_jaro_dispatch_via_compute_stats():
    """compute_stats takes the fused path when both impls are pallas_scan and
    the shapes qualify — outputs identical to the separate-kernel path."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.stats import compute_stats
    from strsim_tpu.utils import encode as enc

    cols_a = ["phillips", "smith", "a", "", "chamberlain"[:15], "abcab"]
    cols_b = ["philips", "smyth", "b", "x", "chamberlin"[:15], "bacba"]
    a = enc.encode_column(cols_a, pad=enc.PAD_A, width=15)
    b = enc.encode_column(cols_b, pad=enc.PAD_B, width=15)
    args = (jnp.asarray(a.codes), jnp.asarray(b.codes),
            jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    fused = compute_stats(*args, ("levenshtein", "jaro"),
                          (("levenshtein", "pallas_scan"), ("jaro", "pallas_scan")))
    sep_lev = compute_stats(*args, ("levenshtein",),
                            (("levenshtein", "pallas_scan"),))
    sep_jaro = compute_stats(*args, ("jaro",), (("jaro", "pallas_scan"),))
    assert np.asarray(fused["lev_d"]).tolist() == np.asarray(sep_lev["lev_d"]).tolist()
    assert np.asarray(fused["jaro_m"]).tolist() == np.asarray(sep_jaro["jaro_m"]).tolist()
    assert np.asarray(fused["jaro_t"]).tolist() == np.asarray(sep_jaro["jaro_t"]).tolist()


def test_fused_five_kernel_parity():
    """Round-5 fused-FIVE kernel: with_inter/with_prefix outputs vs the
    oracle at W=1 widths and every compaction slot width. W=2 widths
    (47/63) are not interpretable in CI time (same XLA:CPU limit as the
    multiword lev kernel — see test_pallas_scan_fuzz_matches_xla_myers's
    note) and are held to 262K-row bit-exact TPU parity by
    tools/ab_fused_five.py (FUSED_FIVE_AB.json); their only genuinely new
    logic, the blocked 64x64 transpose, is oracle-checked below."""
    from collections import Counter

    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops import lev_jaro_pallas as ljp
    from strsim_tpu.ops import oracle
    from strsim_tpu.utils import encode as enc

    assert ljp.supports_width(63) and not ljp.supports_width(65)

    rng = np.random.default_rng(20260820)
    for width, pack, base in ((7, 4, 97), (15, 4, 97), (31, 4, 97),
                              (15, 2, 0x4E00), (15, 1, 0x1D100)):
        n = 64
        cols = []
        for _ in range(2):
            out = []
            for _ in range(n):
                ln = int(rng.integers(0, width + 1))
                out.append("".join(chr(base + int(c))
                                   for c in rng.integers(0, 5, ln)))
            cols.append(out)
        cols[0][:6] = ["", "", "a", "a", "b", "ab"]
        cols[1][:6] = ["", "x", "a", "b", "b", "ba"]
        a = enc.encode_column(cols[0], pad=enc.PAD_A, width=width)
        b = enc.encode_column(cols[1], pad=enc.PAD_B, width=width)
        ca, cb = a.codes, b.codes
        if pack < 4:
            ca, cb = ca.astype(np.int32), cb.astype(np.int32)
        else:
            # pack=4 requires 8-bit tiles; force int8 so the test does not
            # depend on the native encoder having narrowed the column
            ca, cb = ca.astype(np.int8), cb.astype(np.int8)
        args = (jnp.asarray(ca), jnp.asarray(cb),
                jnp.asarray(a.lengths), jnp.asarray(b.lengths))
        lev, m, t, inter, pref = ljp.fused_stats_pallas(
            *args, with_inter=True, with_prefix=True, pack=pack)
        for i in range(n):
            x, y = cols[0][i], cols[1][i]
            if x and y:
                assert int(lev[i]) == oracle.levenshtein_distance(x, y), (
                    width, pack, i, x, y)
                if not (len(x) == 1 and len(y) == 1):
                    wm, wt = oracle.jaro_stats(x, y)
                    assert (int(m[i]), int(t[i])) == (wm, wt), (
                        width, pack, i, x, y)
            csa, csb = Counter(x), Counter(y)
            want_i = sum(min(csa[c], csb[c]) for c in csa)
            assert int(inter[i]) == want_i, (width, pack, i, x, y)
            want_p = 0
            for k in range(min(4, len(x), len(y))):
                if x[k] != y[k]:
                    break
                want_p += 1
            assert int(pref[i]) == want_p, (width, pack, i, x, y)


def test_fused_mega7_kernel_parity():
    """The mega kernel's osa/lcs outputs (round 5: they consume the
    transposed Eq words the Myers scan already uses) vs the XLA kernels and
    the oracle at W=1 widths, incl. adjacent swaps (OSA's TR vector),
    empties and equal rows. W=2 widths are TPU-validated by
    tools/ab_fused_five.py."""
    from collections import Counter

    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops import lev_jaro_pallas as ljp
    from strsim_tpu.ops import oracle
    from strsim_tpu.ops.lcs import lcs_length
    from strsim_tpu.ops.osa_myers import osa_distance_myers
    from strsim_tpu.utils import encode as enc

    rng = np.random.default_rng(77)
    for width in (7, 15, 31):
        n = 128
        cols = []
        for _ in range(2):
            cols.append(["".join(chr(97 + int(c)) for c in
                                 rng.integers(0, 4, int(rng.integers(0, width + 1))))
                         for _ in range(n)])
        cols[0][:4] = ["", "ab", "abc", "ba"]
        cols[1][:4] = ["x", "ba", "acb", "ab"]
        for i in range(0, n, 7):
            cols[1][i] = cols[0][i]
        for i in range(3, n, 13):
            if len(cols[0][i]) > 2:
                k = int(rng.integers(0, len(cols[0][i]) - 1))
                s = cols[0][i]
                cols[1][i] = s[:k] + s[k + 1] + s[k] + s[k + 2:]
        a = enc.encode_column(cols[0], pad=enc.PAD_A, width=width)
        b = enc.encode_column(cols[1], pad=enc.PAD_B, width=width)
        args = (jnp.asarray(a.codes.astype(np.int8)),
                jnp.asarray(b.codes.astype(np.int8)),
                jnp.asarray(a.lengths), jnp.asarray(b.lengths))
        lev, m, t, inter, pref, osa, lcs = ljp.fused_stats_pallas(
            *args, with_inter=True, with_prefix=True,
            with_osa=True, with_lcs=True)
        assert np.asarray(osa).tolist() == np.asarray(
            osa_distance_myers(*args)).tolist(), width
        assert np.asarray(lcs).tolist() == np.asarray(
            lcs_length(*args)).tolist(), width
        for i in range(n):
            x, y = cols[0][i], cols[1][i]
            if x and y:
                assert int(lev[i]) == oracle.levenshtein_distance(x, y)
                if not (len(x) == 1 and len(y) == 1):
                    wm, wt = oracle.jaro_stats(x, y)
                    assert (int(m[i]), int(t[i])) == (wm, wt), (width, i, x, y)
            ca, cb = Counter(x), Counter(y)
            assert int(inter[i]) == sum(min(ca[c], cb[c]) for c in ca)


def test_fused_mega7_dispatch_via_compute_stats():
    """The all-14 stat set routes lev/jaro/inter/prefix/osa/lcs through ONE
    mega-kernel pallas call (+ the bigram kernel + soundex) — osa_d and
    lcs_len must NOT fall through to a separate dp-fused call when jaro is
    in the set."""
    import re

    import jax
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.stats import compute_stats
    from strsim_tpu.utils import encode as enc

    cols_a = ["night", "abcdef", "", "ba", "same"]
    cols_b = ["nacht", "abdcef", "x", "ab", "same"]
    a = enc.encode_column(cols_a, pad=enc.PAD_A, width=15)
    b = enc.encode_column(cols_b, pad=enc.PAD_B, width=15)
    args = (jnp.asarray(a.codes.astype(np.int8)),
            jnp.asarray(b.codes.astype(np.int8)),
            jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    msr = ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice",
           "osa", "lcs_seq", "indel")
    impls = (("levenshtein", "pallas_scan"), ("jaro", "pallas_scan"),
             ("multiset", "pallas_scan"), ("osa", "pallas_scan"),
             ("lcs", "pallas_scan"))
    got = compute_stats(*args, msr, impls)
    ref = compute_stats(*args, msr, ())
    assert set(got) == {"lev_d", "jaro_m", "jaro_t", "inter", "prefix",
                        "osa_d", "lcs_len"}
    for k in got:
        assert np.asarray(got[k]).tolist() == np.asarray(ref[k]).tolist(), k
    jaxpr = str(jax.make_jaxpr(lambda *xs: compute_stats(*xs, msr, impls))(*args))
    n_pallas = len(re.findall(r"= pallas_call", jaxpr))
    assert n_pallas == 1, f"expected 1 pallas_call for the 7-stat set, found {n_pallas}"


def test_fused_blocked_transpose_w2():
    """The W=2 (64x64 blocked) bit transpose vs a numpy oracle: out word
    orientation eql[j][w'] bit i == eqj[i][w] bit j at L = 47 and 63 —
    the only new W=2 logic not shared with TPU-validated kernels."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.lev_jaro_pallas import _transpose_eq

    rng = np.random.default_rng(5)
    for L in (47, 63):
        mat = rng.integers(0, 2, size=(L, L)).astype(np.uint64)
        eqj = []
        for i in range(L):
            words = []
            for w in range(2):
                bits = mat[i, 32 * w: min(32 * w + 32, L)]
                val = np.uint32(
                    (bits << np.arange(bits.size, dtype=np.uint64)).sum()
                    & 0xFFFFFFFF
                )
                words.append(jnp.asarray(val)[None])
            eqj.append(words)
        eql = _transpose_eq(eqj, L, 2, (1,))
        for j in range(L):
            for i in range(L):
                got = (int(np.asarray(eql[j][i // 32])[0]) >> (i % 32)) & 1
                assert got == int(mat[i, j]), (L, i, j)


def test_fused_five_dispatch_via_compute_stats():
    """compute_stats routes the full five-measure stat set through the
    round-5 mega kernel (one pallas call covering lev_d, jaro_m/t, inter,
    prefix) — outputs identical to the separate-impl paths, and the fused
    inter/prefix only activate when their impls/needs line up."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.stats import compute_stats
    from strsim_tpu.utils import encode as enc

    cols_a = ["phillips", "smith", "a", "", "chamberlain"[:15], "abcab"]
    cols_b = ["philips", "smyth", "b", "x", "chamberlin"[:15], "bacba"]
    a = enc.encode_column(cols_a, pad=enc.PAD_A, width=15)
    b = enc.encode_column(cols_b, pad=enc.PAD_B, width=15)
    # force int8 tiles: without the native library encode_column's numpy
    # path yields int32 and the pack=4 fused route (itemsize==1) would fall
    # through, failing the single-pallas-call assertion below spuriously
    args = (jnp.asarray(a.codes.astype(np.int8)),
            jnp.asarray(b.codes.astype(np.int8)),
            jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    five = ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice")
    impls = (("levenshtein", "pallas_scan"), ("jaro", "pallas_scan"),
             ("multiset", "pallas_scan"))
    fused = compute_stats(*args, five, impls)
    assert set(fused) == {"lev_d", "jaro_m", "jaro_t", "inter", "prefix"}
    # the five-stat program must be ONE pallas call — no redundant separate
    # multiset kernel or XLA cumprod prefix recomputing (and overwriting)
    # the mega kernel's outputs (the round-5 regression this guards against
    # cost 28% on device before it was caught)
    import jax

    jaxpr = str(jax.make_jaxpr(
        lambda *xs: compute_stats(*xs, five, impls))(*args))
    import re

    n_pallas = len(re.findall(r"= pallas_call", jaxpr))
    assert n_pallas == 1, f"expected 1 pallas_call, found {n_pallas}"
    assert "cumprod" not in jaxpr, "XLA prefix recomputed despite fused prefix"
    ref = compute_stats(*args, five, ())  # default XLA impls
    for k in fused:
        assert np.asarray(fused[k]).tolist() == np.asarray(ref[k]).tolist(), k
    # multiset impl not pallas_scan: inter must come from the chosen impl,
    # fused path still serving lev/jaro/prefix — results identical
    mixed = compute_stats(*args, five, (("levenshtein", "pallas_scan"),
                                        ("jaro", "pallas_scan"),
                                        ("multiset", "chunked")))
    for k in mixed:
        assert np.asarray(mixed[k]).tolist() == np.asarray(ref[k]).tolist(), k


@pytest.mark.parametrize("width", [7, 15, 31])
def test_pallas_bigram_fuzz_matches_xla(width):
    """Bigram multiset Pallas kernel (16-bit packed tokens on int8 tiles,
    two-compare form on int32) vs the XLA scan + the ham/eq stat contracts,
    incl. empty/1-char rows (no bigrams), equal pairs, and a batch not
    divisible by 8."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.bigram_pallas import bigram_stats_pallas, supports_width
    from strsim_tpu.ops.multiset_loop import bigram_intersection_loop
    from strsim_tpu.ops.stats import row_equal
    from strsim_tpu.utils import encode as enc

    assert supports_width(63) and not supports_width(65)

    rng = np.random.default_rng(width)
    for base, cast in ((97, False), (0x4E00, True)):
        n = 203
        cols = []
        for _ in range(2):
            out = []
            for _ in range(n):
                ln = int(rng.integers(0, width + 1))
                out.append("".join(chr(base + int(c))
                                   for c in rng.integers(0, 4, ln)))
            cols.append(out)
        cols[0][:4] = ["", "a", "ab", "aab"]
        cols[1][:4] = ["", "b", "ab", "aba"]
        for i in range(0, n, 11):
            cols[1][i] = cols[0][i]
        a = enc.encode_column(cols[0], pad=enc.PAD_A, width=width)
        b = enc.encode_column(cols[1], pad=enc.PAD_B, width=width)
        ca, cb = a.codes, b.codes
        if cast:
            ca, cb = ca.astype(np.int32), cb.astype(np.int32)
        args = (jnp.asarray(ca), jnp.asarray(cb),
                jnp.asarray(a.lengths), jnp.asarray(b.lengths))
        i2, ham, eqv = bigram_stats_pallas(*args)
        assert np.asarray(i2).tolist() == np.asarray(
            bigram_intersection_loop(*args)).tolist()
        assert np.asarray(ham).tolist() == np.asarray(
            jnp.sum((args[0] == args[1]).astype(jnp.int32), axis=1)).tolist()
        assert np.asarray(eqv).tolist() == np.asarray(row_equal(*args)).tolist()


def test_bigram_dispatch_via_compute_stats():
    """compute_stats routes inter2 (+ the ham/eq side products) through the
    bigram Pallas kernel when the impl selects it; results identical to the
    XLA path, and wide buckets fall through."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.stats import compute_stats
    from strsim_tpu.utils import encode as enc

    cols_a = ["night", "nacht", "", "aab", "x"]
    cols_b = ["nacht", "night", "x", "aba", "x"]
    msr = ("jaccard_bigram", "hamming", "sorensen_dice_bigram")
    for width in (15, 95):
        a = enc.encode_column(cols_a, pad=enc.PAD_A, width=width)
        b = enc.encode_column(cols_b, pad=enc.PAD_B, width=width)
        args = (jnp.asarray(a.codes), jnp.asarray(b.codes),
                jnp.asarray(a.lengths), jnp.asarray(b.lengths))
        got = compute_stats(*args, msr, (("bigram", "pallas_scan"),))
        ref = compute_stats(*args, msr, ())
        assert set(got) == set(ref) == {"inter2", "eq", "ham_m"}
        for k in got:
            assert np.asarray(got[k]).tolist() == np.asarray(ref[k]).tolist(), (
                width, k)


@pytest.mark.parametrize("width", [7, 15, 31, 95, 255])
def test_dp_fused_kernel_parity(width):
    """Same-orientation fused DP kernel (one Eq build -> lev/osa/lcs): every
    subset vs the XLA kernels at W=1 widths AND the fori_loop wide variant
    (95/255 — loop bodies are CI-interpretable, unlike the W=2 unrolls,
    which are TPU-validated by tools/ab_dp_fused.py), incl. empties, equal
    pairs, adjacent swaps (the OSA TR vector) and odd batch."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.dp_fused_pallas import (
        dp_fused_stats_pallas, supports_width,
    )
    from strsim_tpu.ops.lcs import lcs_length
    from strsim_tpu.ops.levenshtein_myers import levenshtein_distance_myers
    from strsim_tpu.ops.osa_myers import osa_distance_myers
    from strsim_tpu.utils import encode as enc

    assert supports_width(512) and not supports_width(513)

    rng = np.random.default_rng(width)
    n = 203
    cols = []
    for _ in range(2):
        out = []
        for _ in range(n):
            ln = int(rng.integers(0, width + 1))
            out.append("".join(chr(97 + int(c))
                               for c in rng.integers(0, 4, ln)))
        cols.append(out)
    cols[0][:4] = ["", "ab", "abc", "ba"]
    cols[1][:4] = ["x", "ba", "acb", "ab"]
    for i in range(0, n, 11):
        cols[1][i] = cols[0][i]
    a = enc.encode_column(cols[0], pad=enc.PAD_A, width=width)
    b = enc.encode_column(cols[1], pad=enc.PAD_B, width=width)
    args = (jnp.asarray(a.codes), jnp.asarray(b.codes),
            jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    lev, osa, lcs = dp_fused_stats_pallas(
        *args, with_lev=True, with_osa=True, with_lcs=True)
    assert np.asarray(lev).tolist() == np.asarray(
        levenshtein_distance_myers(*args)).tolist()
    assert np.asarray(osa).tolist() == np.asarray(
        osa_distance_myers(*args)).tolist()
    assert np.asarray(lcs).tolist() == np.asarray(lcs_length(*args)).tolist()
    (lcs2,) = dp_fused_stats_pallas(*args, with_lcs=True)
    assert np.asarray(lcs2).tolist() == np.asarray(lcs).tolist()
    osa3, lcs3 = dp_fused_stats_pallas(*args, with_osa=True, with_lcs=True)
    assert np.asarray(osa3).tolist() == np.asarray(osa).tolist()
    assert np.asarray(lcs3).tolist() == np.asarray(lcs).tolist()


def test_dp_fused_dispatch_via_compute_stats():
    """compute_stats routes osa+lcs (and lev when jaro is absent) through
    the same-orientation fused kernel in ONE pallas call; with jaro in the
    set, lev rides the shared-equality kernel and the DP kernel serves the
    rest — results identical to the default impls either way."""
    import re

    import jax
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.stats import compute_stats
    from strsim_tpu.utils import encode as enc

    cols_a = ["night", "abcdef", "", "ba", "same"]
    cols_b = ["nacht", "abdcef", "x", "ab", "same"]
    a = enc.encode_column(cols_a, pad=enc.PAD_A, width=15)
    b = enc.encode_column(cols_b, pad=enc.PAD_B, width=15)
    args = (jnp.asarray(a.codes), jnp.asarray(b.codes),
            jnp.asarray(a.lengths), jnp.asarray(b.lengths))

    msr = ("levenshtein", "osa", "lcs_seq", "indel")
    impls = (("levenshtein", "pallas_scan"), ("osa", "pallas_scan"),
             ("lcs", "pallas_scan"))
    got = compute_stats(*args, msr, impls)
    ref = compute_stats(*args, msr, ())
    assert set(got) == {"lev_d", "osa_d", "lcs_len"}
    for k in got:
        assert np.asarray(got[k]).tolist() == np.asarray(ref[k]).tolist(), k
    jaxpr = str(jax.make_jaxpr(lambda *xs: compute_stats(*xs, msr, impls))(*args))
    assert len(re.findall(r"= pallas_call", jaxpr)) == 1

    # jaro in the set: the shared-equality mega kernel absorbs osa/lcs too
    # (they consume its transposed Eq words) — ONE pallas call, results
    # unchanged. The tiles must be int8 for the mega route (pack=4).
    msr2 = ("levenshtein", "jaro", "osa", "lcs_seq")
    impls2 = impls + (("jaro", "pallas_scan"),)
    args8 = (jnp.asarray(np.asarray(args[0]).astype(np.int8)),
             jnp.asarray(np.asarray(args[1]).astype(np.int8)),
             args[2], args[3])
    got2 = compute_stats(*args8, msr2, impls2)
    ref2 = compute_stats(*args8, msr2, ())
    for k in got2:
        assert np.asarray(got2[k]).tolist() == np.asarray(ref2[k]).tolist(), k
    jaxpr2 = str(jax.make_jaxpr(lambda *xs: compute_stats(*xs, msr2, impls2))(*args8))
    assert len(re.findall(r"= pallas_call", jaxpr2)) == 1


def test_fused_lev_jaro_fallthrough_conditions():
    """The fused path must NOT activate (and results stay correct via the
    separate kernels) when the width exceeds one flag word, the tiles are
    not int8, or only one of the two impls selects pallas_scan."""
    import numpy as np
    import jax.numpy as jnp

    from strsim_tpu.ops.stats import compute_stats
    from strsim_tpu.utils import encode as enc
    from strsim_tpu.ops import oracle

    cols_a = ["phillips", "featherstone", "chamberlain"]
    cols_b = ["philips", "featherston", "chamberlin"]

    def check(width, force_int32=False, impls=(("levenshtein", "pallas_scan"),
                                               ("jaro", "pallas_scan"))):
        a = enc.encode_column(cols_a, pad=enc.PAD_A, width=width)
        b = enc.encode_column(cols_b, pad=enc.PAD_B, width=width)
        ca = a.codes.astype(np.int32) if force_int32 else a.codes
        cb = b.codes.astype(np.int32) if force_int32 else b.codes
        got = compute_stats(jnp.asarray(ca), jnp.asarray(cb),
                            jnp.asarray(a.lengths), jnp.asarray(b.lengths),
                            ("levenshtein", "jaro"), impls)
        for i, (x, y) in enumerate(zip(cols_a, cols_b)):
            assert int(got["lev_d"][i]) == oracle.levenshtein_distance(x, y)
            m, t = oracle.jaro_stats(x, y)
            assert int(got["jaro_m"][i]) == m and int(got["jaro_t"][i]) == t

    # width > 31: separate kernels (95 = the fori wide variants, which ARE
    # interpretable in CI time; 33-64 unrolled multiword bodies are not —
    # see test_pallas_scan_fuzz_matches_xla_myers's note)
    check(95)
    check(15, force_int32=True)     # non-int8 tiles: separate kernels
    check(15, impls=(("levenshtein", "myers"), ("jaro", "pallas_scan")))
    check(15, impls=(("levenshtein", "pallas_scan"), ("jaro", "bitmask")))
