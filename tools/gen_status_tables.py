"""Generate the docs/STATUS.md + README headline tables from the benchmark
artifacts (BENCH_DETAILS.json, BENCH_LINKAGE.json, MULTIHOST_MEASURED.json)
so doc numbers are regenerated, never hand-carried (VERDICT r2 item 9 — the
round-2 tables drifted because they were edited by hand).

Usage: python tools/gen_status_tables.py   (prints markdown to stdout)

Refuses to run on a dirty git tree (VERDICT r4 item 7): the tables these
numbers land in must provably match COMMITTED artifacts, not working-tree
state. Override for local iteration with STRSIM_ALLOW_DIRTY=1.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _require_clean_tree():
    if os.environ.get("STRSIM_ALLOW_DIRTY"):
        return
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "status", "--porcelain"],
            capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        return  # not a git checkout (e.g. sdist) — nothing to enforce
    # PROGRESS.jsonl is driver-owned telemetry, continuously rewritten
    dirty = [l for l in out.splitlines() if l.strip()
             and not l.endswith("PROGRESS.jsonl")]
    if dirty:
        sys.exit(
            "gen_status_tables: refusing to run on a dirty tree — commit the "
            "benchmark artifacts first so docs match committed evidence "
            "(STRSIM_ALLOW_DIRTY=1 to override):\n" + "\n".join(dirty)
        )


def _load(name):
    try:
        with open(os.path.join(REPO, name)) as f:
            return json.load(f)
    except Exception:
        return None


def headline_table(details) -> str:
    rows = ["| measure | resident pairs/s | vs single-core C++ | parity |",
            "|---|---|---|---|"]
    for m, r in details.get("measures", {}).items():
        res = r.get("resident_pairs_per_sec")
        spd = r.get("resident_speedup_vs_single_core")
        par = "bit-exact" if r.get("bit_exact_parity") else "FAIL"
        if res is None:
            continue
        rows.append(f"| {m} | {res/1e6:.1f} M | {spd:.0f}× | {par} |")
    fused = details.get("fused", {})
    if fused.get("resident_pairs_per_sec"):
        v = fused["resident_pairs_per_sec"]
        rows.append(
            f"| fused all five | {v/1e6:.1f} M (= {5*v/1e9:.2f} B "
            f"measure-pairs/s) | — | bit-exact |"
        )
    return "\n".join(rows)


def wide_table(details) -> str:
    wide = details.get("wide_buckets", {})
    if not wide:
        return "(no wide-bucket section in BENCH_DETAILS.json)"
    out = ["| measure | resident pairs/s | vs single-core | per-pair ns by bucket | max adjacent ratio | parity |",
           "|---|---|---|---|---|---|"]
    for m, r in wide.items():
        res = r.get("resident_pairs_per_sec")
        if res is None:
            continue
        spd = r.get("resident_speedup_vs_single_core")
        pp = r.get("per_pair_ns", {})
        pps = " / ".join(f"w{w}:{v:.0f}" for w, v in sorted(pp.items(), key=lambda t: int(t[0])))
        ratios = r.get("adjacent_per_pair_ratio", {})
        mx = max(ratios.values()) if ratios else None
        par = "bit-exact" if r.get("bit_exact_parity") else "?"
        out.append(
            f"| {m} | {res/1e6:.1f} M | {spd:.0f}× | {pps} | "
            f"{mx:.2f}× | {par} |"
        )
    return "\n".join(out)


def linkage_table(link) -> str:
    out = ["| path | resident rate | vs single-core |", "|---|---|---|"]
    for m, r in link.get("measures", {}).items():
        out.append(
            f"| top-k {m} | {r['resident_candidate_pairs_per_sec']/1e6:.1f} M "
            f"cand-pairs/s | {r['vs_single_core']}× |"
        )
    ens = link.get("ensemble_2field")
    if ens:
        out.append(
            f"| 2-field ensemble | "
            f"{ens['resident_candidate_record_pairs_per_sec']/1e6:.1f} M "
            f"record-pairs/s | {ens['vs_single_core']}× |"
        )
    return "\n".join(out)


def scaling_table(mh) -> str:
    weak = mh.get("sharded_kernel_cpu_mesh_weak", {})
    out = ["| devices | sharding overhead (fixed total work, median ± IQR) |", "|---|---|"]
    for n, r in weak.get("devices", {}).items():
        out.append(f"| {n} | {r.get('statement', '—')} |")
    for key in ("jax_distributed_2proc", "jax_distributed_4proc"):
        r = mh.get(key)
        if r:
            bits = all(w.get("bit_exact") for w in r.get("workers", []))
            out.append(f"| {key}: ok={r.get('ok')} bit_exact={bits} | |")
    return "\n".join(out)


def main():
    _require_clean_tree()
    details = _load("BENCH_DETAILS.json")
    link = _load("BENCH_LINKAGE.json")
    mh = _load("MULTIHOST_MEASURED.json")
    print("## Headline (device-resident, chunk-differenced, bit-exact)\n")
    if details:
        print(headline_table(details))
    print("\n## Wide-ladder coverage (lengths 48..511)\n")
    if details:
        print(wide_table(details))
    print("\n## Record linkage (serving path)\n")
    if link:
        print(linkage_table(link))
    print("\n## Scaling evidence\n")
    if mh:
        print(scaling_table(mh))


if __name__ == "__main__":
    main()
    sys.exit(0)
