"""Randomized differential soak: pipeline vs native C++ on random
batches (sizes, alphabets, lengths, nulls) until SOAK_SECONDS expires.
Any bit-for-float mismatch fails with a repro. Usage:
    SOAK_SECONDS=600 python tools/soak_differential.py
"""
import os, random, sys, time
os.environ["STRSIM_FORCE_CPU"] = "1"
sys.path.insert(0, "/root/repo")
import numpy as np
import strsim_tpu as st
from strsim_tpu.native import native_compute_strings

DEADLINE = time.time() + int(os.environ.get("SOAK_SECONDS", "1200"))
rng = random.Random(int(time.time()))
alphas = ["ab", "abc", "abcdefgh", "abcdefghijklmnopqrstuvwxyz -'", "aéü日本語𝄞́"]
# full registry: the 5 reference measures + every extension (incl. soundex)
from strsim_tpu.models.measures import MEASURE_NAMES as MEASURES  # noqa: E402
batches = 0
while time.time() < DEADLINE:
    n = rng.choice([37, 513, 4097, 20011])
    alpha = rng.choice(alphas)
    maxlen = rng.choice([3, 9, 17, 40, 80, 200])
    col_a, col_b = [], []
    for i in range(n):
        la, lb = rng.randrange(0, maxlen), rng.randrange(0, maxlen)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = a if rng.random() < 0.1 else "".join(rng.choice(alpha) for _ in range(lb))
        if rng.random() < 0.01: a = None
        if rng.random() < 0.01: b = None
        col_a.append(a); col_b.append(b)
    m = rng.choice(MEASURES)
    got = st.compute(m, col_a, col_b)
    want = native_compute_strings(m, col_a, col_b)
    if got.tobytes() != want.tobytes():
        bad = np.nonzero(~((got == want) | (np.isnan(got) & np.isnan(want))))[0]
        print("MISMATCH", m, "n=", n, "alpha=", alpha, "maxlen=", maxlen)
        for i in bad[:5]:
            print(repr(col_a[i]), repr(col_b[i]), got[i], want[i])
        sys.exit(1)
    batches += 1
print(f"SOAK PASSED: {batches} randomized batches, all bit-exact")
