"""Bigram-multiset extension measures (not in the reference)."""
import random

import numpy as np

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES


def test_bigram_examples():
    # "night" vs "nacht": bigrams {ni,ig,gh,ht} vs {na,ac,ch,ht} -> inter 1
    got = st.compute("jaccard_bigram", ["night"], ["nacht"])
    assert abs(got[0] - 1.0 / 7.0) < 1e-12
    got = st.compute("sorensen_dice_bigram", ["night"], ["nacht"])
    assert abs(got[0] - 2.0 / 8.0) < 1e-12


def test_bigram_edges():
    out = st.compute_many(
        ["jaccard_bigram", "sorensen_dice_bigram"],
        ["", "a", "ab", "ab", None],
        ["", "a", "ab", "cd", "x"],
    )
    for m in out:
        v = out[m]
        assert v[0] == 1.0      # both empty
        assert v[1] == 1.0      # equal len-1 (fast path)
        assert v[2] == 1.0      # equal
        assert v[3] == 0.0      # disjoint bigrams
        assert np.isnan(v[4])   # null


def test_bigram_equal_without_fast_path():
    """Equal pairs (incl. bigram-less length-1) must score 1.0 from the kernel
    path alone: the kernels emit a row-equality stat the finalizers honor even
    with cfg.equal_fast_path disabled (ADVICE round 1)."""
    cfg = st.get_config().replace(equal_fast_path=False)
    out = st.compute_many(
        ["jaccard_bigram", "sorensen_dice_bigram"],
        ["a", "ab", "xyz", "a"],
        ["a", "ab", "xyz", "b"],
        config=cfg,
    )
    for m, v in out.items():
        assert v[0] == 1.0, (m, v)  # equal len-1, no bigrams
        assert v[1] == 1.0, (m, v)
        assert v[2] == 1.0, (m, v)
        assert v[3] == 0.0, (m, v)


def test_bigram_scores_on_device():
    """Device-resident f32 finalizers exist for the extension measures too."""
    import jax.numpy as jnp

    from strsim_tpu.ops.finalize_device import scores_on_device
    from strsim_tpu.utils import encode as enc

    pairs = [("night", "nacht"), ("a", "a"), ("ab", "cd"), ("abcab", "abcab")]
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=7)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=7)
    out = scores_on_device(
        jnp.asarray(a.codes), jnp.asarray(b.codes),
        jnp.asarray(a.lengths), jnp.asarray(b.lengths),
        ("jaccard_bigram", "sorensen_dice_bigram"),
    )
    jb = np.asarray(out["jaccard_bigram"])
    sb = np.asarray(out["sorensen_dice_bigram"])
    assert abs(jb[0] - 1.0 / 7.0) < 1e-6
    assert abs(sb[0] - 2.0 / 8.0) < 1e-6
    assert jb[1] == 1.0 and sb[1] == 1.0  # equal len-1 via device equal patch
    assert jb[2] == 0.0 and sb[2] == 0.0
    assert jb[3] == 1.0 and sb[3] == 1.0


def test_bigram_kernel_vs_oracle_fuzz():
    rng = random.Random(17)
    pairs = [
        (
            "".join(rng.choice("abc") for _ in range(rng.randrange(0, 20))),
            "".join(rng.choice("abc") for _ in range(rng.randrange(0, 20))),
        )
        for _ in range(400)
    ]
    col_a = [a for a, _ in pairs]
    col_b = [b for _, b in pairs]
    for m in ("jaccard_bigram", "sorensen_dice_bigram"):
        got = st.compute(m, col_a, col_b)
        want = np.array([ORACLES[m](a, b) for a, b in pairs])
        assert got.tobytes() == want.tobytes(), m
