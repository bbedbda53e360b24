"""Measure registry: the five similarity measures as declarative descriptors.

Mirrors the reference's SimilarityFunctionType enum + trait dispatch
(src/expressions/strsim.rs:9-19) — but instead of dynamic dispatch to scalar
kernels, each measure declares which integer statistics it needs on device and
which host finalizer turns them into exact f64 scores.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import numpy as np

from strsim_tpu.ops import finalize as _finalize
from strsim_tpu.ops import oracle as _oracle
from strsim_tpu.ops.stats import STAT_FIELDS


@dataclasses.dataclass(frozen=True)
class Measure:
    name: str
    stat_fields: Tuple[str, ...]
    finalizer: Callable[[Dict[str, np.ndarray], np.ndarray, np.ndarray], np.ndarray]
    oracle: Callable[[str, str], float]


MEASURES: Dict[str, Measure] = {
    name: Measure(
        name=name,
        stat_fields=STAT_FIELDS[name],
        finalizer=_finalize.FINALIZERS[name],
        oracle=_oracle.ORACLES[name],
    )
    for name in (
        # reference-parity measures
        "levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice",
        # extensions (bigram-multiset; NOT reference measures — note: these
        # rely on the pipeline's equal fast path for equal pairs shorter than
        # 2 chars, which is on by default)
        "jaccard_bigram", "sorensen_dice_bigram",
        # extensions: char-multiset cosine/overlap (reuse the inter stat —
        # free when fused with jaccard/dice), positional hamming, and
        # bit-parallel LCS similarity (ops/lcs.py)
        "cosine", "overlap", "hamming", "lcs_seq", "indel",
        # extension: OSA / restricted Damerau-Levenshtein (bit-parallel
        # Hyyrö kernel, ops/osa_myers.py)
        "osa",
        # extension: American Soundex phonetic equality (ops/phonetic.py) —
        # also the key generator behind models/blocking.py
        "soundex",
    )
}

MEASURE_NAMES = tuple(MEASURES)


def resolve_measures(measures) -> Tuple[str, ...]:
    if isinstance(measures, str):
        measures = (measures,)
    out = []
    for m in measures:
        if m not in MEASURES:
            raise KeyError(f"unknown measure {m!r}; available: {', '.join(MEASURES)}")
        out.append(m)
    return tuple(out)
