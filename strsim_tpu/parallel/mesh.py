"""Device-mesh data parallelism.

The reference's only parallelism axis is CPU row-chunking over rayon threads
(src/expressions/strsim.rs:72-105). The TPU-native analogue is a 1-D batch
mesh: row pairs are sharded over devices along the batch dimension with
jax.sharding; the per-pair kernels are embarrassingly parallel, so no
collective is required for compute — only the implicit gather when results are
fetched. Output assembly is deterministic (shards keep row order), matching
the reference's order-preserving chunk concat (strsim.rs:98-103).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from strsim_tpu.config import get_config


def make_mesh(devices: Optional[Sequence] = None, axis: Optional[str] = None) -> Mesh:
    axis = axis or get_config().batch_axis
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh axis; replicate the rest."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def sharded_stats_fn(measures: Tuple[str, ...], mesh: Mesh):
    """A jitted fused-stats step sharded over the batch axis.

    Inputs [B, L] codepoint tiles + [B] lengths with B divisible by the mesh
    size; XLA partitions the kernels with zero communication.
    """
    from strsim_tpu.ops.stats import compute_stats

    tile = batch_sharding(mesh, 2)
    vec = batch_sharding(mesh, 1)

    @jax.jit
    def step(a, b, la, lb):
        a = jax.lax.with_sharding_constraint(a, tile)
        b = jax.lax.with_sharding_constraint(b, tile)
        la = jax.lax.with_sharding_constraint(la, vec)
        lb = jax.lax.with_sharding_constraint(lb, vec)
        return compute_stats(a, b, la, lb, measures)

    return step


def device_put_sharded_batch(arrays, mesh: Mesh):
    """Place host arrays with batch-dim sharding (single-controller path)."""
    return tuple(
        jax.device_put(arr, batch_sharding(mesh, arr.ndim)) for arr in arrays
    )
