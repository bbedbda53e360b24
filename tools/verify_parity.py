"""One-command parity verification against the reference behavior.

Checks, through the full public pipeline (device kernels included):
  1. all 1,115 golden cases from the reference's test corpus at its own
     tolerance (1e-8, src/expressions/strsim.rs:350);
  2. bit-for-float agreement with the host oracle on the same corpus;
  3. the README demo table (README.md:59-72) including null/empty rows;
  4. broadcast + shape-error semantics;
  5. the eight extension measures bit-exact vs their oracles on a mixed
     random + edge-row corpus (through the device kernels, fast paths off).

Usage: python tools/verify_parity.py   (add STRSIM_FORCE_CPU=1 to skip TPU)
"""
import json
import math
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES

GOLDEN = pathlib.Path(__file__).parent.parent / "tests" / "golden"
CORE = ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice")


def main() -> int:
    failures = 0
    total = 0
    for measure in CORE:
        cases = json.loads((GOLDEN / f"{measure}.json").read_text())
        col_a = [a for a, _, _ in cases]
        col_b = [b for _, b, _ in cases]
        got = st.compute(measure, col_a, col_b)
        want_golden = np.array([e for _, _, e in cases])
        want_oracle = np.array([ORACLES[measure](a, b) for a, b in zip(col_a, col_b)])
        n_tol = int((np.abs(got - want_golden) >= 1e-8).sum())
        bit_exact = got.tobytes() == want_oracle.tobytes()
        total += len(cases)
        status = "OK " if (n_tol == 0 and bit_exact) else "FAIL"
        if n_tol or not bit_exact:
            failures += 1
        print(f"{status} {measure:14s} {len(cases):4d} golden cases | "
              f"tolerance misses: {n_tol} | bit-exact vs oracle: {bit_exact}")

    name_a = ["phillips", "phillips", "", "", None, None]
    name_b = ["phillips", "philips", "phillips", "", "phillips", None]
    demo = st.compute_many(list(CORE), name_a, name_b)
    expect = {
        "levenshtein": [1.0, 0.875, 0.0, 1.0, None, None],
        "jaro": [1.0, 23 / 24, 0.0, 1.0, None, None],
        "jaro_winkler": [1.0, 0.975, 0.0, 1.0, None, None],
        "jaccard": [1.0, 0.875, 0.0, 1.0, None, None],
        "sorensen_dice": [1.0, 14 / 15, 0.0, 1.0, None, None],
    }
    demo_ok = all(
        (w is None and math.isnan(demo[m][i])) or (w is not None and abs(demo[m][i] - w) < 1e-12)
        for m, ws in expect.items()
        for i, w in enumerate(ws)
    )
    print(f"{'OK ' if demo_ok else 'FAIL'} README demo table (incl. null/empty rows)")
    failures += 0 if demo_ok else 1

    try:
        st.compute("jaro", ["a", "b"], ["a", "b", "c"])
        print("FAIL shape mismatch did not raise")
        failures += 1
    except ValueError:
        print("OK  shape-mismatch error semantics")
    bc = st.compute("levenshtein", ["smith", "smyth"], st.lit("smith"))
    bc_ok = bc[0] == 1.0 and abs(bc[1] - 0.8) < 1e-12
    print(f"{'OK ' if bc_ok else 'FAIL'} length-1 literal broadcast")
    failures += 0 if bc_ok else 1

    import random

    from strsim_tpu.models.measures import MEASURE_NAMES

    ext = tuple(m for m in MEASURE_NAMES if m not in CORE)
    rng = random.Random(2026)
    alphabets = ["ab", "abcdefgh", "aé日𝄞x"]
    pairs = []
    for i in range(400):
        alpha = alphabets[i % 3]
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60)))
        if i % 13 == 0:
            b = a
        if i % 17 == 0 and len(a) > 2:
            k = rng.randrange(len(a) - 1)
            b = a[:k] + a[k + 1] + a[k] + a[k + 2:]
        pairs.append((a, b))
    pairs += [("", ""), ("", "x"), ("x", ""), ("a", "a"), ("ab", "ba"), ("ca", "abc")]
    col_a = [a for a, _ in pairs]
    col_b = [b for _, b in pairs]
    kcfg = st.get_config().replace(equal_fast_path=False, host_short_circuit_rows=0)
    for measure in ext:
        got = st.compute(measure, col_a, col_b, config=kcfg)
        want = np.array([ORACLES[measure](a, b) for a, b in pairs])
        ok = got.tobytes() == want.tobytes()
        print(f"{'OK ' if ok else 'FAIL'} {measure:20s} {len(pairs):4d} cases | "
              f"bit-exact vs oracle (device kernels): {ok}")
        failures += 0 if ok else 1

    print(f"\n{total} golden cases; {'ALL CHECKS PASSED' if failures == 0 else f'{failures} CHECK GROUPS FAILED'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
