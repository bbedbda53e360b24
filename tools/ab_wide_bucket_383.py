"""Settle the 255->383 wide-bucket per-pair cost anomaly (VERDICT r3 item 4).

Round-3 measured the adjacent-bucket per-pair ratio at 3.29x (levenshtein) /
4.01x (jaro_winkler) for the 255->383 step on the uniform 48..511 workload,
vs the O((L+1)^2) compute-ideal 2.25x. Two candidate explanations:

  H1 (kernel-level): the width-383 wide kernel is intrinsically less
     efficient per element (VMEM pressure halves its block rows: 2048 at
     255 -> 1024 at 383, _wide_block_rows).
  H2 (length-mix): the per-pair averages divide by different in-bucket
     length distributions (bucket 255 holds rows 192..255, bucket 383 holds
     256..383; trips scale with each block's max len_b), so the RATIO mixes
     bucket geometry with workload composition.

Experiment A (fixed length — isolates the kernel): all rows exactly length
L for L in {255, 319, 383}; per-pair ns from the chunk-differenced device
time; compare measured ratios to ((L1+1)/(L0+1))^2.

Experiment B (the ladder A/B — the actionable decision): resident
throughput of the uniform 48..511 levenshtein workload under the default
ladder vs the ladder with a 319 sub-edge. Accept the edge iff it wins
resident throughput (same accept/reject rule as the round-2 finer-ladder
study).

Run on TPU: python tools/ab_wide_bucket_383.py
Writes WIDE383_AB.json; conclusion recorded in docs/ROOFLINE.md.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[ab383 +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def fixed_length_probe(L: int, measures=("levenshtein",), n_rows=8192):
    """Per-pair ns for rows ALL of length L in a width-L bucket."""
    import jax.numpy as jnp

    from strsim_tpu.config import get_config
    from strsim_tpu.models import pipeline as pp
    from strsim_tpu.utils.devicetime import marginal_block_time

    cfg = get_config()
    rng = np.random.default_rng(L)
    block = min(pp._block_rows(L, cfg, measures, np.int8),
                pp._round_batch(n_rows, cfg))
    n_pad = ((n_rows + block - 1) // block) * block
    codes = rng.integers(97, 123, size=(n_pad, 2 * L)).astype(np.int8)
    lens = np.full((n_pad, 2), L, dtype=np.int32)
    C = n_pad // block
    base = pp._get_kernel(measures, pp._impls_for(cfg, L, np.int8))
    t_block = marginal_block_time(
        base,
        jnp.asarray(codes.reshape(C, block, 2 * L)),
        jnp.asarray(lens.reshape(C, block, 2)),
    )
    return t_block * 1e9 / block  # per-pair ns


def main():
    from strsim_tpu.config import get_config, set_config

    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"  # CPU flow check only
    n_probe = 512 if smoke else 8192
    out = {}

    # --- A: fixed-length kernel probes ---------------------------------
    probes = {}
    for L in (255, 319, 383):
        per_pair = fixed_length_probe(L, n_rows=n_probe)
        probes[str(L)] = {"per_pair_ns": round(per_pair, 1)}
        log(f"fixed-len L={L}: {per_pair:.0f} ns/pair")
    for l0, l1 in ((255, 319), (255, 383), (319, 383)):
        meas = probes[str(l1)]["per_pair_ns"] / probes[str(l0)]["per_pair_ns"]
        ideal = ((l1 + 1) / (l0 + 1)) ** 2
        probes[f"{l0}->{l1}"] = {
            "measured_ratio": round(meas, 2),
            "ideal_ratio": round(ideal, 2),
            "excess_pct": round((meas / ideal - 1) * 100, 1),
        }
        log(f"ratio {l0}->{l1}: measured {meas:.2f} vs ideal {ideal:.2f}")
    out["fixed_length"] = probes

    # --- B: ladder A/B on the uniform 48..511 workload ------------------
    from bench import make_wide_pairs, measure_resident
    from strsim_tpu.utils import encode as enc

    col_a, col_b = make_wide_pairs(200_000 if not smoke else 4_000)
    a, b = enc.encode_pair(col_a, col_b)
    del col_a, col_b
    base_cfg = get_config()
    arms = {
        "default_ladder": base_cfg.buckets,
        "with_319_edge": tuple(sorted(set(base_cfg.buckets) | {319})),
    }
    ladder = {}
    for name, edges in arms.items():
        set_config(base_cfg.replace(buckets=edges))
        try:
            res = measure_resident(a, b, ("levenshtein",))
        finally:
            set_config(base_cfg)
        if res is None:
            continue
        pps, bucket_times, device_s = res
        ladder[name] = {
            "buckets": list(edges),
            "resident_pairs_per_sec": round(pps),
            "device_s": round(device_s, 4),
            "per_pair_ns": {
                str(w): round(bt["block_ms"] * 1e6 / bt["block_rows"], 1)
                for w, bt in bucket_times.items()
            },
        }
        log(f"{name}: resident {pps:,.0f} pairs/s (device {device_s * 1e3:.1f} ms)")
    if "default_ladder" in ladder and "with_319_edge" in ladder:
        gain = (ladder["with_319_edge"]["resident_pairs_per_sec"]
                / ladder["default_ladder"]["resident_pairs_per_sec"] - 1)
        ladder["verdict"] = {
            "gain_pct": round(gain * 100, 1),
            "accept_319_edge": gain > 0.02,
        }
        log(f"319-edge gain: {gain * 100:+.1f}%")
    out["ladder_ab"] = ladder

    path = os.path.join(REPO, "WIDE383_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
