import numpy as np
import jax.numpy as jnp

from strsim_tpu.ops import oracle
from strsim_tpu.ops.multiset_loop import multiset_intersection_loop
from strsim_tpu.utils import encode as enc


def test_loop_multiset_vs_oracle(golden):
    pairs = [(a, b) for a, b, _ in golden["jaccard"] + golden["sorensen_dice"] if a and b]
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=32)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=32)
    inter = np.asarray(
        multiset_intersection_loop(
            jnp.asarray(a.codes), jnp.asarray(b.codes),
            jnp.asarray(a.lengths), jnp.asarray(b.lengths),
        )
    )
    want = np.array([oracle.multiset_intersection(x, y) for x, y in pairs])
    np.testing.assert_array_equal(inter, want)
