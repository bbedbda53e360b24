"""Device-resident f32 finalization.

For pipelines that consume scores on-device (blocking, ranking, joins inside a
larger jax program), fetching f64 host scores would bounce through the host.
These finalizers evaluate the same formulas as ops/finalize.py in f32 on
device. They are NOT the bit-for-float parity path (that is host f64); f32
scores differ from the reference by <= 1 ulp of f32 (~6e-8, within the
reference's own 1e-8·~10 test tolerance scale but not bit-identical).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def _empties(len_a: Array, len_b: Array):
    both = (len_a == 0) & (len_b == 0)
    any_ = (len_a == 0) | (len_b == 0)
    return both, any_


def levenshtein_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    maxlen = jnp.maximum(la, lb)
    d = jnp.where(any_, maxlen, stats["lev_d"])
    sim = 1.0 - d.astype(jnp.float32) / jnp.maximum(maxlen, 1).astype(jnp.float32)
    return jnp.where(both, 1.0, sim)


def jaro_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, _ = _empties(la, lb)
    m = stats["jaro_m"]
    t = stats["jaro_t"]
    mf = m.astype(jnp.float32)
    sim = (
        mf / jnp.maximum(la, 1).astype(jnp.float32)
        + mf / jnp.maximum(lb, 1).astype(jnp.float32)
        + (m - t // 2).astype(jnp.float32) / jnp.maximum(m, 1).astype(jnp.float32)
    ) / 3.0
    sim = jnp.where(m == 0, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def jaro_winkler_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    js = jaro_device(stats, la, lb)
    boost = stats["prefix"].astype(jnp.float32) * 0.1 * (1.0 - js)
    return jnp.where(js > 0.7, js + boost, js)


def jaccard_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    inter = stats["inter"]
    den = la + lb - inter
    sim = inter.astype(jnp.float32) / jnp.maximum(den, 1).astype(jnp.float32)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def sorensen_dice_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    inter = stats["inter"]
    sim = 2.0 * inter.astype(jnp.float32) / jnp.maximum(la + lb, 1).astype(jnp.float32)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def jaccard_bigram_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    na = jnp.maximum(la - 1, 0)
    nb = jnp.maximum(lb - 1, 0)
    inter = stats["inter2"]
    sim = inter.astype(jnp.float32) / jnp.maximum(na + nb - inter, 1).astype(jnp.float32)
    return jnp.where((na == 0) | (nb == 0), 0.0, sim)


def sorensen_dice_bigram_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    na = jnp.maximum(la - 1, 0)
    nb = jnp.maximum(lb - 1, 0)
    inter = stats["inter2"]
    sim = 2.0 * inter.astype(jnp.float32) / jnp.maximum(na + nb, 1).astype(jnp.float32)
    return jnp.where((na == 0) | (nb == 0), 0.0, sim)


def cosine_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    inter = stats["inter"]
    den = jnp.sqrt((la * lb).astype(jnp.float32))
    sim = inter.astype(jnp.float32) / jnp.maximum(den, 1.0)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def overlap_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    inter = stats["inter"]
    den = jnp.maximum(jnp.minimum(la, lb), 1)
    sim = inter.astype(jnp.float32) / den.astype(jnp.float32)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def hamming_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, _ = _empties(la, lb)
    den = jnp.maximum(jnp.maximum(la, lb), 1)
    sim = stats["ham_m"].astype(jnp.float32) / den.astype(jnp.float32)
    return jnp.where(both, 1.0, sim)


def lcs_seq_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    den = jnp.maximum(jnp.maximum(la, lb), 1)
    sim = stats["lcs_len"].astype(jnp.float32) / den.astype(jnp.float32)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def indel_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    den = jnp.maximum(la + lb, 1)
    sim = 2.0 * stats["lcs_len"].astype(jnp.float32) / den.astype(jnp.float32)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


def osa_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    maxlen = jnp.maximum(la, lb)
    d = jnp.where(any_, maxlen, stats["osa_d"])
    sim = 1.0 - d.astype(jnp.float32) / jnp.maximum(maxlen, 1).astype(jnp.float32)
    return jnp.where(both, 1.0, sim)


def soundex_device(stats: Dict[str, Array], la: Array, lb: Array) -> Array:
    both, any_ = _empties(la, lb)
    sim = stats["sdx_eq"].astype(jnp.float32)
    sim = jnp.where(any_, 0.0, sim)
    return jnp.where(both, 1.0, sim)


DEVICE_FINALIZERS = {
    "levenshtein": levenshtein_device,
    "jaro": jaro_device,
    "jaro_winkler": jaro_winkler_device,
    "jaccard": jaccard_device,
    "sorensen_dice": sorensen_dice_device,
    # extension measures: the equal-string patch in scores_on_device supplies
    # the "equal -> 1.0" semantics (incl. bigram-less length-1 equal pairs)
    "jaccard_bigram": jaccard_bigram_device,
    "sorensen_dice_bigram": sorensen_dice_bigram_device,
    "cosine": cosine_device,
    "overlap": overlap_device,
    "hamming": hamming_device,
    "lcs_seq": lcs_seq_device,
    "indel": indel_device,
    "osa": osa_device,
    "soundex": soundex_device,
}


def scores_on_device(a, b, len_a, len_b, measures, impls=()) -> Dict[str, Array]:
    """Jittable: padded tiles in, {measure: f32 scores [B]} out, all device-
    resident. Compose inside larger jit programs (record-linkage blocking,
    top-k candidate ranking) without a host round-trip."""
    from strsim_tpu.ops.stats import compute_stats

    stats = compute_stats(a, b, len_a, len_b, tuple(measures), tuple(impls))
    # equal-string fast path (reference strsim.rs:128,182,288,324): needed on
    # device because the jaro kernel's window is empty for len-1 pairs (the
    # host pipeline handles this before kernels; this API is self-contained).
    pos = jnp.arange(a.shape[1], dtype=jnp.int32)[None, :]
    equal = (len_a == len_b) & jnp.all((a == b) | (pos >= len_a[:, None]), axis=1)
    return {
        m: jnp.where(equal, 1.0, DEVICE_FINALIZERS[m](stats, len_a, len_b))
        for m in measures
    }
