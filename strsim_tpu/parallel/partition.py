"""Length-skew-aware work partitioning across hosts/shards.

The reference splits rows into equal-count chunks (split_offsets,
src/expressions/strsim.rs:21-39) — correct when per-row cost is uniform, but a
straggler factory for skewed string lengths: one chunk full of 500-char pairs
runs O(L²) Levenshtein wavefronts while the others idle. BASELINE.json's north
star calls out "length-skew-aware rebalancing" for exactly this reason.

This module provides both:
  * split_offsets(n, k): the reference-equivalent equal-count split (baseline);
  * cost_balanced_partition: greedy LPT assignment of rows to k shards under a
    per-measure cost model — Levenshtein pays the padded bucket wavefront
    (L_bucket²), Jaro pays L_bucket² / the match window, multiset pays
    L_bucket² compare tables; all padded-bucket-based so the model matches what
    the device actually executes.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def split_offsets(n: int, k: int) -> List[Tuple[int, int]]:
    """Equal-count (offset, len) chunks; last chunk absorbs the remainder —
    the reference's split (strsim.rs:21-39), kept as the comparison baseline."""
    if k <= 1 or n == 0:
        return [(0, n)]
    chunk = n // k
    out = []
    for i in range(k):
        off = i * chunk
        out.append((off, n - off if i == k - 1 else chunk))
    return out


def row_cost(
    len_a: np.ndarray,
    len_b: np.ndarray,
    measures: Sequence[str],
    buckets: Sequence[int],
) -> np.ndarray:
    """Device cost estimate per row: padded bucket width drives every kernel's
    per-row work (the device executes full [L_bucket] lanes regardless of the
    true length)."""
    maxlen = np.maximum(len_a, len_b)
    edges = np.asarray(buckets)
    pos = np.clip(np.searchsorted(edges, maxlen), 0, len(edges) - 1)
    w = edges[pos].astype(np.float64)
    w = np.where(maxlen > edges[-1], 2.0 ** np.ceil(np.log2(np.maximum(maxlen, 1))), w)
    cost = np.zeros(maxlen.shape, dtype=np.float64)
    for m in measures:
        if m == "levenshtein":
            cost += 2.0 * w * w  # 2L-1 diagonals × L lanes
        elif m in ("jaro", "jaro_winkler"):
            cost += w * w  # L greedy steps × L lanes
        else:
            cost += w * w  # [L, L] compare tables
    return np.maximum(cost, 1.0)


def cost_balanced_partition(costs: np.ndarray, k: int) -> List[np.ndarray]:
    """Greedy longest-processing-time assignment of rows to k shards.

    Rows are grouped into contiguous blocks (device transfers like contiguity),
    blocks sorted by cost descending, each assigned to the least-loaded shard.
    Returns k arrays of row indices. Deterministic.
    """
    n = costs.shape[0]
    if k <= 1 or n == 0:
        return [np.arange(n)]
    # block granularity: enough blocks for balance, few enough for cheap gathers
    n_blocks = min(n, max(4 * k, 64))
    bounds = np.linspace(0, n, n_blocks + 1).astype(np.int64)
    blocks = [(i, np.arange(bounds[i], bounds[i + 1])) for i in range(n_blocks)]
    block_cost = np.array([costs[b].sum() for _, b in blocks])
    order = np.argsort(-block_cost, kind="stable")
    loads = np.zeros(k)
    assign: List[List[np.ndarray]] = [[] for _ in range(k)]
    for bi in order:
        tgt = int(np.argmin(loads))
        loads[tgt] += block_cost[bi]
        assign[tgt].append(blocks[bi][1])
    out = []
    for parts in assign:
        idx = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
        out.append(np.sort(idx))
    return out


def balance_report(costs: np.ndarray, parts: List[np.ndarray]) -> dict:
    """Imbalance metrics: max/mean shard load ratio (1.0 = perfect)."""
    loads = np.array([costs[p].sum() for p in parts])
    mean = loads.mean() if loads.size else 0.0
    return {
        "shard_loads": loads.tolist(),
        "imbalance": float(loads.max() / mean) if mean > 0 else 1.0,
        # named *_model: this is the COST-MODEL's load-balance projection, not a
        # measured wall-clock number — measured multi-process scaling lives in
        # MULTIHOST_MEASURED.json (tools/bench_multihost.py)
        "scaling_efficiency_model": float(mean / loads.max()) if loads.max() > 0 else 1.0,
    }
