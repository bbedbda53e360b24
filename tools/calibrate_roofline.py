"""Calibrate the roofline hardware envelope against the real chip.

VERDICT r1 flagged the envelope constants in ops/roofline.py ("~8-wide
per-lane issue") as unvalidated guesses. This tool MEASURES them.

Methodology (relay-immune, hoist-proof):
  * One executable = lax.scan over a vector of CHUNK INDICES; each step
    dynamically indexes one device-resident chunk and folds it into a carried
    scalar. XLA cannot hoist the body (the index is data) and cannot dedupe
    executions (the carry chains).
  * Wall time is taken around a VALUE FETCH (np.asarray) — block_until_ready
    returns early through the axon relay and is never trusted.
  * The step count is differenced (wall(C2) - wall(C1)) / (C2 - C1), so
    dispatch/fetch/relay fixed costs cancel. Index rotation (i mod n_chunks)
    lets total traffic grow without extra device memory, so the delta can be
    pushed far above relay noise even at ~1 TB/s.

Measured:
  * vpu_i32_ops_per_sec — K dependent (y ^ x) + x rounds per element per
    step on a 2 MB chunk: pure int32 ALU.
  * hbm_bytes_per_sec — per step, sum-reduce a distinct 256 MB chunk from a
    4-chunk (1 GB) rotation: streaming HBM read (footprint >> VMEM).

Writes CALIBRATION.json at the repo root; ops/roofline.py picks it up and
reports envelope provenance "measured". Run standalone (one TPU process at a
time).
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _wall(fn, chunks, idx) -> float:
    t0 = time.perf_counter()
    np.asarray(fn(chunks, idx))  # scalar fetch forces remote completion
    return time.perf_counter() - t0


def _marginal_step_time(
    run, chunks, n_chunks: int, c1: int, c2: int, reps: int = 5
) -> float:
    idx1 = jnp.asarray(np.arange(c1, dtype=np.int32) % n_chunks)
    idx2 = jnp.asarray(np.arange(c2, dtype=np.int32) % n_chunks)
    _wall(run, chunks, idx1)  # compile + warm both scan lengths
    _wall(run, chunks, idx2)
    deltas = []
    for _ in range(reps):
        t1 = _wall(run, chunks, idx1)
        t2 = _wall(run, chunks, idx2)
        deltas.append(t2 - t1)
    return max(min(deltas), 1e-9) / (c2 - c1)


def measure_vpu_i32(rounds: int = 256) -> dict:
    n_chunks, B, W2 = 8, 4096, 128  # 8 x 2 MB chunks
    elems = B * W2
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.integers(1, 1 << 20, size=(n_chunks, B, W2), dtype=np.int32)
    )

    @jax.jit
    def run(chunks, idx):  # chunks is an ARGUMENT — never a foldable constant
        def step(carry, i):
            c = lax.dynamic_index_in_dim(chunks, i, axis=0, keepdims=False)
            y = c + carry
            for _ in range(rounds):  # static unroll; y is loop-carried
                y = (y ^ c) + c
            return jnp.sum(y, dtype=jnp.int32), None

        tot, _ = lax.scan(step, jnp.int32(0), idx)
        return tot

    # scale the step count until the marginal work dwarfs relay noise
    per_step = _marginal_step_time(run, chunks, n_chunks, 64, 512)
    target_steps = max(int(0.4 / per_step), 1024)
    per_step = _marginal_step_time(run, chunks, n_chunks, 256, 256 + target_steps)
    ops = (2.0 * rounds + 3.0) * elems  # xor+add per round, + init/reduce
    return {
        "chunk_elems": elems,
        "alu_rounds": rounds,
        "s_per_step": per_step,
        "vpu_i32_ops_per_sec": ops / per_step,
    }


def measure_hbm() -> dict:
    n_chunks, B, W2 = 4, 262144, 256  # 4 x 256 MB chunks (1 GB >> VMEM)
    chunk_bytes = B * W2 * 4
    rng = np.random.default_rng(1)
    chunks = jnp.asarray(
        rng.integers(0, 127, size=(n_chunks, B, W2), dtype=np.int32)
    )

    @jax.jit
    def run(chunks, idx):
        def step(carry, i):
            c = lax.dynamic_index_in_dim(chunks, i, axis=0, keepdims=False)
            return carry + jnp.sum(c, dtype=jnp.int32), None

        tot, _ = lax.scan(step, jnp.int32(0), idx)
        return tot

    per_step = _marginal_step_time(run, chunks, n_chunks, 8, 64)
    target_steps = max(int(0.4 / per_step), 64)
    per_step = _marginal_step_time(run, chunks, n_chunks, 32, 32 + target_steps)
    return {
        "chunk_bytes": chunk_bytes,
        "s_per_step": per_step,
        "hbm_bytes_per_sec": chunk_bytes / per_step,
    }


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    vpu = measure_vpu_i32()
    print(f"VPU int32: {vpu['vpu_i32_ops_per_sec']/1e12:.3f} Tops/s "
          f"({vpu['s_per_step']*1e6:.1f} us/step)", flush=True)
    hbm = measure_hbm()
    print(f"HBM stream read: {hbm['hbm_bytes_per_sec']/1e9:.1f} GB/s "
          f"({hbm['s_per_step']*1e6:.1f} us/step)", flush=True)
    out = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "method": "step-count differencing over an index-rotated scan of resident chunks (relay-immune, hoist-proof)",
        "vpu_i32_ops_per_sec": vpu["vpu_i32_ops_per_sec"],
        "hbm_bytes_per_sec": hbm["hbm_bytes_per_sec"],
        "detail": {"vpu": vpu, "hbm": hbm},
    }
    with open(ROOT / "CALIBRATION.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "detail"}))


if __name__ == "__main__":
    main()
