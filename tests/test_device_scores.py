import numpy as np
import jax
import jax.numpy as jnp

from strsim_tpu.ops.finalize_device import scores_on_device
from strsim_tpu.ops.oracle import ORACLES
from strsim_tpu.utils import encode as enc


def test_device_scores_close_to_oracle(golden):
    pairs = [(a, b) for a, b, _ in golden["jaro_winkler"][:200]]
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=32)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=32)
    fn = jax.jit(lambda ca, cb, la, lb: scores_on_device(
        ca, cb, la, lb, ("levenshtein", "jaro_winkler", "jaccard")))
    out = fn(jnp.asarray(a.codes), jnp.asarray(b.codes),
             jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    for m in ("levenshtein", "jaro_winkler", "jaccard"):
        got = np.asarray(out[m])
        want = np.array([ORACLES[m](x, y) for x, y in pairs])
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_device_scores_extension_measures():
    """Every extension measure has a device finalizer (scores_on_device and
    top_k_matches accept the full measure set, not just the reference five)."""
    import random

    from strsim_tpu.models.measures import MEASURE_NAMES

    rng = random.Random(11)
    alpha = "abcdef"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 20))),
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 20))),
        )
        for _ in range(200)
    ]
    pairs += [("", ""), ("", "x"), ("ab", "ba"), ("q", "q")]
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=24)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=24)
    measures = tuple(MEASURE_NAMES)
    fn = jax.jit(lambda ca, cb, la, lb: scores_on_device(ca, cb, la, lb, measures))
    out = fn(jnp.asarray(a.codes), jnp.asarray(b.codes),
             jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    for m in measures:
        got = np.asarray(out[m])
        want = np.array([ORACLES[m](x, y) for x, y in pairs])
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=m)


def test_device_scores_edge_rows():
    """Empty/one-empty/equal rows through the self-contained device API."""
    col_a = ["", "", "same", "x", "s"]
    col_b = ["", "x", "same", "", "s"]
    a = enc.encode_column(col_a, pad=enc.PAD_A, width=8)
    b = enc.encode_column(col_b, pad=enc.PAD_B, width=8)
    fn = jax.jit(lambda ca, cb, la, lb: scores_on_device(
        ca, cb, la, lb, ("levenshtein", "jaro", "jaccard")))
    out = fn(jnp.asarray(a.codes), jnp.asarray(b.codes),
             jnp.asarray(a.lengths), jnp.asarray(b.lengths))
    for m in out:
        got = np.asarray(out[m])
        want = np.array([ORACLES[m](x, y) for x, y in zip(col_a, col_b)], dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=m)
