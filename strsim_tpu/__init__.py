"""tpu-strsim: TPU-native vectorized string-similarity engine.

A from-scratch JAX/XLA/Pallas implementation of the five normalized string
similarity measures provided by the reference CPU engine (foxcroftjn/polars-strsim):
Levenshtein, Jaro, Jaro-Winkler, Jaccard and Sørensen-Dice
(reference: src/expressions/strsim.rs:109-345), with exact (bit-for-float f64)
score parity, the same null-propagation / empty-string / broadcast rules
(reference: src/expressions/strsim.rs:41-107), and a Polars expression layer
mirroring polars_strsim/__init__.py:8-69 when polars is installed.

Architecture (TPU-first, not a translation of the reference's Rust):
  strings → vectorized UCS4 codepoint tiles (utils/encode.py)
          → length-bucketed padded [B, L] int32 batches (models/pipeline.py)
          → integer sufficient-statistic kernels on device (ops/stats.py XLA,
            ops/*_pallas.py Pallas) — batched across thousands of pairs
          → exact IEEE-f64 finalization on host (ops/finalize.py)
          → f64 scores + validity (nulls preserved).

Scaling: batch-sharded device mesh via jax.sharding (parallel/mesh.py), with
length-skew-aware partitioning across hosts (parallel/partition.py).
"""

import os as _os

if _os.environ.get("STRSIM_FORCE_CPU") == "1":
    # Escape hatch for dev boxes where a TPU plugin pins jax_platforms at
    # interpreter start (sitecustomize), making JAX_PLATFORMS=cpu ineffective.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from strsim_tpu.api import (
    levenshtein,
    jaro,
    jaro_winkler,
    jaccard,
    sorensen_dice,
    jaccard_bigram,
    sorensen_dice_bigram,
    cosine,
    overlap,
    hamming,
    lcs_seq,
    indel,
    osa,
    soundex,
    compute,
    compute_many,
    compute_with_validity,
    lit,
    Literal,
)
from strsim_tpu import minipl
from strsim_tpu.config import StrsimConfig, get_config, set_config
from strsim_tpu.models.engine import StrsimEngine
from strsim_tpu.models.linkage import (
    dedup_top_k,
    ensemble_scores,
    top_k_matches,
    top_k_matches_multi,
)
from strsim_tpu.utils.preprocess import preprocess_column
from strsim_tpu.models.blocking import (
    DEFAULT_BLOCKING_KEYS,
    blocked_pairs,
    dedup_blocked,
    dedup_blocked_stream,
    dedup_records_blocked,
    dedup_sorted_neighborhood,
    nysiis_keys,
    soundex_keys,
    top_k_matches_blocked,
    top_k_matches_multi_blocked,
    unpack_soundex,
)
from strsim_tpu.models.measures import MEASURES

__version__ = "0.4.0"

__all__ = [
    "levenshtein",
    "jaro",
    "jaro_winkler",
    "jaccard",
    "sorensen_dice",
    "jaccard_bigram",
    "sorensen_dice_bigram",
    "cosine",
    "overlap",
    "hamming",
    "lcs_seq",
    "indel",
    "osa",
    "soundex",
    "compute",
    "compute_many",
    "compute_with_validity",
    "lit",
    "Literal",
    "minipl",
    "StrsimConfig",
    "StrsimEngine",
    "get_config",
    "set_config",
    "MEASURES",
    "top_k_matches",
    "top_k_matches_multi",
    "dedup_top_k",
    "ensemble_scores",
    "blocked_pairs",
    "dedup_blocked",
    "dedup_blocked_stream",
    "dedup_records_blocked",
    "dedup_sorted_neighborhood",
    "soundex_keys",
    "nysiis_keys",
    "top_k_matches_blocked",
    "DEFAULT_BLOCKING_KEYS",
    "top_k_matches_multi_blocked",
    "unpack_soundex",
    "preprocess_column",
]
