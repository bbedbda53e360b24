"""Run the round-4 TPU validation tools in ONE process.

Each python process pays the one-time terminal-side Mosaic init (65s-30min,
CLAUDE.md cost model), so the A/B + validation tools are batched here:

  1. tools/ab_devicetime_validation.py  -> DEVICETIME_VALIDATION.json
  2. tools/ab_jaro_sol_probe.py         -> JARO_SOL_PROBE.json
  3. tools/ab_wide_bucket_383.py        -> WIDE383_AB.json
  4. the verify skill's README-demo parity drive (bit-exact check)

Run solo (one TPU process at a time):  python tools/run_r4_tpu_suite.py
Exits via os._exit(0) after a bounded backend release (see bench.py).
"""
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[r4suite +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def demo_parity():
    import numpy as np

    import strsim_tpu as st
    from strsim_tpu.ops.oracle import ORACLES

    A = ["phillips", "phillips", "", "", None, None, "a\U0001D11Eb", "smith"]
    B = ["phillips", "philips", "phillips", "", "phillips", None, "ab", "smyth"]
    for m in ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice"):
        got = st.compute(m, A, B)
        want = np.array([
            np.nan if (x is None or y is None) else ORACLES[m](x, y)
            for x, y in zip(A, B)
        ])
        assert got.tobytes() == want.tobytes(), m
    log("README-demo + astral parity on TPU: bit-exact for all five measures")


def main():
    steps = []
    t = time.time()
    try:
        import ab_devicetime_validation

        ab_devicetime_validation.main()
        steps.append(("devicetime_validation", round(time.time() - t, 1), "ok"))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        steps.append(("devicetime_validation", round(time.time() - t, 1), repr(e)))
    t = time.time()
    try:
        import ab_jaro_sol_probe

        ab_jaro_sol_probe.main()
        steps.append(("jaro_sol_probe", round(time.time() - t, 1), "ok"))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        steps.append(("jaro_sol_probe", round(time.time() - t, 1), repr(e)))
    t = time.time()
    try:
        import ab_wide_bucket_383

        ab_wide_bucket_383.main()
        steps.append(("wide_bucket_383", round(time.time() - t, 1), "ok"))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        steps.append(("wide_bucket_383", round(time.time() - t, 1), repr(e)))
    t = time.time()
    try:
        demo_parity()
        steps.append(("demo_parity", round(time.time() - t, 1), "ok"))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        steps.append(("demo_parity", round(time.time() - t, 1), repr(e)))
    for name, dt, status in steps:
        log(f"{name}: {status} ({dt}s)")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        main()
    finally:
        try:
            from strsim_tpu.utils.compile_guard import run_with_timeout

            def _release():
                import jax

                jax.clear_backends()

            run_with_timeout(_release, 10.0)
        except Exception:
            pass
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
