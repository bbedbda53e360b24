"""Per-kernel speed-of-light roofline accounting.

For each device kernel this module provides an analytic cost model (vector-lane
operations and HBM bytes moved as functions of batch B and bucket width L), a
hardware envelope, and helpers that compare measured wall time against the
speed-of-light bound:

  t_sol = max(lane_ops / vpu_ops_per_sec, hbm_bytes / hbm_bytes_per_sec)
  efficiency = t_sol / t_measured   (1.0 = at the roofline)

The string kernels are integer/VPU workloads (no MXU matmuls), so the compute
axis is VPU lane throughput, not TFLOPs. Default envelope constants are TPU
v5e (one TensorCore: 8x128-lane VPU with ~8-wide per-lane issue at ~0.94 GHz,
819 GB/s HBM) and are config-overridable — treat them as envelope estimates,
not vendor specs.

Cost-model op counts are derived from the kernel bodies (ops/stats.py,
ops/levenshtein_pallas.py, ops/jaro_pallas.py): per grid step the wavefront
does ~10 lane-ops per DP cell-slot (two shifted mins, cost compare, validity
mask, capture select), the jaro scan ~12 per (i, j) slot, the multiset kernel
~6 per L×L table entry.
"""
from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class HardwareEnvelope:
    name: str = "tpu-v5e"
    vpu_ops_per_sec: float = 8 * 128 * 8 * 0.94e9  # lanes × issue width × clock
    hbm_bytes_per_sec: float = 819e9
    vmem_bytes: int = 16 * 2**20  # 16 MiB


V5E = HardwareEnvelope()


@dataclasses.dataclass(frozen=True)
class KernelCost:
    lane_ops: float
    hbm_bytes: float

    def speed_of_light_s(self, hw: HardwareEnvelope = V5E) -> float:
        return max(self.lane_ops / hw.vpu_ops_per_sec, self.hbm_bytes / hw.hbm_bytes_per_sec)


def _io_bytes(batch: int, width: int, n_out: int = 1) -> float:
    # two int32 tiles + two int32 length vectors in; n_out int32 stats out
    return batch * (2 * width * 4 + 2 * 4 + n_out * 4)


def levenshtein_cost(batch: int, width: int) -> KernelCost:
    steps = 2 * width - 1
    return KernelCost(
        lane_ops=10.0 * batch * (width + 1) * steps,
        hbm_bytes=_io_bytes(batch, width),
    )


def jaro_cost(batch: int, width: int) -> KernelCost:
    # match scan: L steps over L b-positions; transposition pass ~ argsort
    # (L log2 L per side) + compare
    import math

    scan = 12.0 * batch * width * width
    trans = batch * (2 * width * max(math.log2(max(width, 2)), 1.0) + 3 * width)
    return KernelCost(lane_ops=scan + trans, hbm_bytes=_io_bytes(batch, width, n_out=3))


def multiset_cost(batch: int, width: int) -> KernelCost:
    return KernelCost(
        lane_ops=6.0 * batch * width * width,
        hbm_bytes=_io_bytes(batch, width),
    )


KERNEL_COSTS = {
    "levenshtein": levenshtein_cost,
    "jaro": jaro_cost,
    "multiset": multiset_cost,
}


def roofline_report(
    kernel: str,
    batch: int,
    width: int,
    measured_s: float,
    hw: HardwareEnvelope = V5E,
) -> Dict[str, float]:
    cost = KERNEL_COSTS[kernel](batch, width)
    sol = cost.speed_of_light_s(hw)
    return {
        "kernel": kernel,
        "batch": batch,
        "width": width,
        "lane_ops": cost.lane_ops,
        "hbm_bytes": cost.hbm_bytes,
        "speed_of_light_s": sol,
        "measured_s": measured_s,
        "efficiency": sol / measured_s if measured_s > 0 else 0.0,
        "bound": "compute"
        if cost.lane_ops / hw.vpu_ops_per_sec >= cost.hbm_bytes / hw.hbm_bytes_per_sec
        else "memory",
        "pairs_per_sec": batch / measured_s if measured_s > 0 else 0.0,
        "sol_pairs_per_sec": batch / sol,
    }
