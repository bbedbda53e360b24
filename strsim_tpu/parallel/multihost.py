"""Multi-host execution: skew-aware sharding of pair batches across hosts.

The workload is embarrassingly parallel per row pair (SURVEY.md §2: no
cross-row reduction exists), so the multi-host design is deliberately
collective-free on the compute path:

  1. every host derives the SAME deterministic partition of row indices from
     the pair lengths (cost-model LPT over contiguous blocks,
     parallel/partition.py) — no coordination needed, matching the
     determinism of the reference's order-preserving chunk concat
     (src/expressions/strsim.rs:98-103);
  2. each host encodes and scores only its own rows on its local devices
     (host-local feed — no cross-host data movement for inputs);
  3. results are either kept host-local (the common case for sharded batch
     jobs) or exchanged with a single all-gather of f64 scores
     (`gather="allgather"`), the only collective this engine ever needs.

jax.distributed bootstrap is wrapped in init_distributed(); everything here
also runs un-initialized as a single "host 0 of 1" (and in tests, N logical
hosts are simulated in one process by calling run_host_shard per host id).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from strsim_tpu.config import StrsimConfig, get_config
from strsim_tpu.parallel.partition import cost_balanced_partition, row_cost


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed if a multi-process setup is configured.
    Returns (process_id, num_processes). Safe to call in single-process mode."""
    import jax

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_partition(
    col_a_lengths: np.ndarray,
    col_b_lengths: np.ndarray,
    measures: Sequence[str],
    n_hosts: int,
    config: Optional[StrsimConfig] = None,
) -> list:
    """Deterministic skew-aware partition of row indices over n_hosts.

    Uses the per-row padded-bucket cost model so a host holding the long-string
    tail gets proportionally fewer rows (the reference's equal-count
    split_offsets is the baseline this improves on, strsim.rs:21-39)."""
    cfg = config or get_config()
    costs = row_cost(col_a_lengths, col_b_lengths, list(measures), cfg.buckets)
    return cost_balanced_partition(costs, n_hosts)


def run_host_shard(
    col_a,
    col_b,
    measures,
    host_id: int,
    n_hosts: int,
    config: Optional[StrsimConfig] = None,
    metrics=None,
) -> Tuple[np.ndarray, Dict[str, Tuple[np.ndarray, np.ndarray]]]:
    """Score this host's shard. Returns (row_indices, {measure: (vals, valid)})
    where row_indices are global row ids for the local results."""
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.utils import encode as enc

    a = col_a if isinstance(col_a, enc.EncodedColumn) else enc.encode_column(col_a, pad=enc.PAD_A)
    b = col_b if isinstance(col_b, enc.EncodedColumn) else enc.encode_column(col_b, pad=enc.PAD_B)
    if a.n != b.n:
        raise ValueError("multi-host path requires equal-length columns")
    parts = host_partition(a.lengths, b.lengths, measures, n_hosts, config)
    mine = parts[host_id]
    res = compute_scores(
        enc.EncodedColumn(a.codes[mine], a.lengths[mine], a.validity[mine]),
        enc.EncodedColumn(b.codes[mine], b.lengths[mine], b.validity[mine]),
        measures,
        config=config,
        metrics=metrics,
    )
    return mine, res


def merge_host_results(
    n_rows: int,
    shards: Sequence[Tuple[np.ndarray, Dict[str, Tuple[np.ndarray, np.ndarray]]]],
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Deterministically reassemble per-host results into row order."""
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for idx, res in shards:
        for m, (vals, valid) in res.items():
            if m not in out:
                out[m] = (
                    np.full(n_rows, np.nan, dtype=np.float64),
                    np.zeros(n_rows, dtype=bool),
                )
            out[m][0][idx] = vals
            out[m][1][idx] = valid
    return out


def allgather_scores(local_idx: np.ndarray, local_vals: np.ndarray, n_rows: int):
    """Optional cross-host exchange so every host holds the full score vector
    (the engine's only collective). Requires jax.distributed to be live.

    Bit-exactness: scores travel as their raw IEEE-754 bit pattern (two int32
    words per f64) plus an explicit int32 ownership flag — never as floats —
    because JAX collectives downcast f64 to f32 when x64 is disabled (the
    default), and any arithmetic merge (max over -inf markers) would also have
    to reason about NaN ordering. Each row is owned by exactly one host
    (parallel/partition.py partitions are disjoint and exhaustive); the merge
    just selects the owner's words, so the gathered vector is byte-identical
    to a single-process run, NaN validity included."""
    from jax.experimental import multihost_utils

    full = np.zeros(n_rows, dtype=np.float64)
    full[local_idx] = local_vals
    own = np.zeros(n_rows, dtype=np.int32)
    own[local_idx] = 1
    words = full.view(np.int32).reshape(n_rows, 2)  # (lo, hi) on little-endian
    payload = np.concatenate([words, own[:, None]], axis=1)  # [n, 3] int32
    gathered = np.asarray(multihost_utils.process_allgather(payload))  # [P, n, 3]
    owner = np.argmax(gathered[:, :, 2], axis=0)  # the unique owning process
    sel = np.ascontiguousarray(gathered[owner, np.arange(n_rows), :2])
    return sel.view(np.float64).reshape(n_rows)
