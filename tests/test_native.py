"""Native C++ host library: decode parity and scalar-kernel exactness."""
import numpy as np
import pytest

from strsim_tpu.native import native_available, decode_utf8_column, native_compute_strings
from strsim_tpu.ops.oracle import ORACLES

CORE_MEASURES = ("jaccard", "jaro", "jaro_winkler", "levenshtein", "sorensen_dice")
from strsim_tpu.utils import encode as enc

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


def _arrow_buffers(strings):
    data = bytearray()
    offsets = [0]
    validity = []
    for s in strings:
        if s is None:
            validity.append(0)
        else:
            validity.append(1)
            data.extend(s.encode("utf-8"))
        offsets.append(len(data))
    return (
        np.frombuffer(bytes(data), dtype=np.uint8) if data else np.zeros(0, np.uint8),
        np.array(offsets, dtype=np.int64),
        np.array(validity, dtype=np.uint8),
    )


def test_decode_matches_numpy_encoder():
    col = ["hello", "", "héllo", None, "日本語", "a𝄞b", "x" * 50]
    data, offsets, validity = _arrow_buffers(col)
    codes, lengths = decode_utf8_column(data, offsets, validity, width=64, pad=enc.PAD_A)
    ref = enc.encode_column(col, pad=enc.PAD_A, width=64)
    np.testing.assert_array_equal(codes, ref.codes)
    np.testing.assert_array_equal(lengths, ref.lengths)


def test_decode_width_overflow():
    data, offsets, validity = _arrow_buffers(["toolong"])
    with pytest.raises(ValueError, match="longer than tile width"):
        decode_utf8_column(data, offsets, validity, width=3, pad=enc.PAD_A)


@pytest.mark.parametrize("measure", CORE_MEASURES)
def test_native_kernels_bitexact_vs_oracle(golden, measure):
    cases = golden[measure]
    col_a = [a for a, _, _ in cases]
    col_b = [b for _, b, _ in cases]
    got = native_compute_strings(measure, col_a, col_b)
    want = np.array([ORACLES[measure](a, b) for a, b in zip(col_a, col_b)])
    assert got.tobytes() == want.tobytes()


def test_native_extension_kernels_bitexact_vs_oracle():
    """Every registered measure (core + extensions) has a native scalar
    kernel bit-identical to the Python oracle — random unicode corpus plus
    the transposition/bigram edge rows."""
    import random

    from strsim_tpu.models.measures import MEASURE_NAMES

    rng = random.Random(23)
    alphabets = ["ab", "abcdefgh", "aé日𝄞x"]
    pairs = []
    for i in range(300):
        alpha = alphabets[i % 3]
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
        if i % 11 == 0:
            b = a
        pairs.append((a, b))
    pairs += [("", ""), ("", "x"), ("x", ""), ("a", "a"), ("ab", "ba"),
              ("ca", "abc"), ("q", "q")]
    col_a = [a for a, _ in pairs]
    col_b = [b for _, b in pairs]
    for measure in MEASURE_NAMES:
        got = native_compute_strings(measure, col_a, col_b)
        want = np.array([ORACLES[measure](a, b) for a, b in pairs])
        assert got.tobytes() == want.tobytes(), measure


def test_native_null_rows_nan():
    got = native_compute_strings("jaro", ["a", None], ["a", "b"])
    assert got[0] == 1.0 and np.isnan(got[1])


def test_native_multithreaded_bitexact():
    import random

    rng = random.Random(5)
    words = ["phillips", "philips", "smith", "smyth", "", "washington-irving"]
    col_a = [words[rng.randrange(6)] for _ in range(20000)]
    col_b = [words[rng.randrange(6)] for _ in range(20000)]
    from strsim_tpu.utils import encode as enc
    from strsim_tpu.native import native_compute

    a = enc.encode_column(col_a, pad=enc.PAD_A)
    b = enc.encode_column(col_b, pad=enc.PAD_B)
    for m in ("levenshtein", "jaro_winkler"):
        st1 = native_compute(m, a.codes, a.lengths, b.codes, b.lengths, None, threads=1)
        mt = native_compute(m, a.codes, a.lengths, b.codes, b.lengths, None, threads=0)
        assert st1.tobytes() == mt.tobytes(), m


def test_native_finalize_bit_exact():
    """Threaded C++ finalize+scatter vs the numpy finalizers: bit-identical
    f64 for all 14 measures over adversarial integer stats — empties on
    either/both sides, m=0, equal rows, t odd/even, len-1 rows, and a
    shuffled scatter index."""
    from strsim_tpu.native import binding as nb
    from strsim_tpu.ops.finalize import FINALIZERS

    if nb.get_lib() is None or not hasattr(nb.get_lib(), "strsim_finalize_scatter"):
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(13)
    n = 70003  # above the threading threshold, odd (uneven chunks)
    la = rng.integers(0, 20, size=n).astype(np.int32)
    lb = rng.integers(0, 20, size=n).astype(np.int32)
    la[:50] = 0
    lb[25:75] = 0  # both-empty and one-empty bands
    la[100:120] = 1
    lb[100:120] = 1
    stats = {
        "lev_d": rng.integers(0, 21, size=n).astype(np.int32),
        "jaro_m": np.minimum(rng.integers(0, 21, size=n),
                             np.minimum(la, lb)).astype(np.int32),
        "jaro_t": rng.integers(0, 9, size=n).astype(np.int32),
        "prefix": rng.integers(0, 5, size=n).astype(np.int32),
        "inter": np.minimum(rng.integers(0, 21, size=n),
                            np.minimum(la, lb)).astype(np.int32),
        "inter2": rng.integers(0, 19, size=n).astype(np.int32),
        "eq": (rng.random(n) < 0.1).astype(np.int32),
        "ham_m": np.minimum(rng.integers(0, 21, size=n),
                            np.minimum(la, lb)).astype(np.int32),
        "lcs_len": np.minimum(rng.integers(0, 21, size=n),
                              np.minimum(la, lb)).astype(np.int32),
        "osa_d": rng.integers(0, 21, size=n).astype(np.int32),
        "sdx_eq": (rng.random(n) < 0.3).astype(np.int32),
    }
    stats["jaro_m"][la == 0] = 0
    stats["jaro_m"][lb == 0] = 0
    sel = rng.permutation(n).astype(np.int64)
    la64 = la.astype(np.int64)
    lb64 = lb.astype(np.int64)
    stats64 = {k: v.astype(np.int64) for k, v in stats.items()}
    for m, fin in FINALIZERS.items():
        want = np.empty(n, dtype=np.float64)
        want[sel] = fin(stats64, la64, lb64)
        got = np.full(n, -7.0, dtype=np.float64)
        ok = nb.finalize_scatter(m, stats, la, lb, got, sel)
        assert ok, m
        assert got.tobytes() == want.tobytes(), m
        # identity scatter too
        got2 = np.full(n, -7.0, dtype=np.float64)
        assert nb.finalize_scatter(m, stats, la, lb, got2, None)
        assert got2.tobytes() == fin(stats64, la64, lb64).tobytes(), m


def test_native_finalize_pipeline_toggle_identical():
    """compute through the pipeline with native_finalize on vs off:
    byte-identical scores on a mixed batch (incl. nulls/empties/equals)."""
    import strsim_tpu as st

    words = ["phillips", "philips", "", None, "smith", "well-known name",
             "a", "\U0001d11e astral"]
    rng = np.random.default_rng(3)
    col_a = [words[i] for i in rng.integers(0, len(words), 4000)]
    col_b = [words[i] for i in rng.integers(0, len(words), 4000)]
    on = st.get_config().replace(native_finalize=True)
    off = st.get_config().replace(native_finalize=False)
    for m in ("levenshtein", "jaro_winkler", "jaccard_bigram", "osa"):
        a = st.compute(m, col_a, col_b, config=on)
        b = st.compute(m, col_a, col_b, config=off)
        assert a.tobytes() == b.tobytes(), m
