"""Block/batch-menu boundary sizes through the full pipeline (off-by-one
hunting at 512/4096 edges and padded-row handling)."""
import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.native import native_available, native_compute_strings


@pytest.mark.parametrize("n", [1, 2, 511, 512, 513, 4095, 4096, 4097])
def test_menu_boundary_sizes(n):
    rng = np.random.default_rng(n)
    words = ["phillips", "philips", "smith", "smyth", "x", ""]
    col_a = [words[i % 6] for i in range(n)]
    col_b = [words[int(v)] for v in rng.integers(0, 6, n)]
    got = st.compute("jaro_winkler", col_a, col_b)
    if native_available():
        want = native_compute_strings("jaro_winkler", col_a, col_b)
        assert got.tobytes() == want.tobytes()
    else:
        from strsim_tpu.ops.oracle import ORACLES

        want = np.array([ORACLES["jaro_winkler"](a, b) for a, b in zip(col_a, col_b)])
        assert got.tobytes() == want.tobytes()


def test_large_broadcast():
    n = 70000  # crosses the 65536 block boundary
    col = ["phillips" if i % 3 else "philips" for i in range(n)]
    got = st.compute("levenshtein", col, st.lit("phillips"))
    assert got[0] == 1.0 if col[0] == "phillips" else True
    assert np.all((got == 1.0) | (np.abs(got - 0.875) < 1e-12))
    assert abs(float(got[[i for i in range(n) if i % 3 == 0][0]]) - 0.875) < 1e-12


def test_chunked_dispatch_path(monkeypatch):
    """The lax.map chunked machinery (off by default) stays correct."""
    from strsim_tpu.models import pipeline as pp

    monkeypatch.setattr(pp, "_CHUNK_MENU", (1, 2, 4))
    cfg = st.get_config().replace(max_batch_block=512, equal_fast_path=False)
    n = 1500  # 3 blocks of 512 -> chunks=4 (padded) in one dispatch
    col_a = ["phillips" if i % 2 else "philips" for i in range(n)]
    col_b = ["philips"] * n
    got = st.compute("levenshtein", col_a, col_b, config=cfg)
    from strsim_tpu.ops.oracle import ORACLES

    want = np.array([ORACLES["levenshtein"](a, b) for a, b in zip(col_a, col_b)])
    assert got.tobytes() == want.tobytes()
