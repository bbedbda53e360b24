"""End-to-end entity-resolution pipeline on tpu-strsim.

The full production shape in ~60 lines: normalize → multi-key block →
exact-scored dedup → review table. Runs on TPU (default) or CPU
(STRSIM_FORCE_CPU=1); every score is the exact-f64 path (bit-identical to
the reference algorithms — tools/verify_parity.py).

    python examples/dedup_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strsim_tpu as st
from strsim_tpu.utils.preprocess import preprocess_column

# 1) Messy input records: case noise, accents, token order, typos, nulls.
given = ["José", "jose", "MARY", "mary  ann", "ann mary", "peter", None, "Jon"]
surname = [
    "García Lopez", "garcia lopez", "Featherstone", "smith", "smith",
    "smith", "smith", "Featherston",
]

# 2) Normalize once (changes WHICH strings compare, never how they score).
STEPS = ("casefold", "strip_accents", "strip", "collapse_spaces", "token_sort")
given_n = preprocess_column(given, STEPS)
surname_n = preprocess_column(surname, STEPS)

# 3) Blocking keys on the surname field — inspect them:
print("soundex keys:", st.unpack_soundex(st.soundex_keys(surname_n)))
print("nysiis  keys:", list(st.nysiis_keys(surname_n)))

# 4) Record-level blocked dedup: block on the surname field with the
#    DEFAULT 3-key union (soundex ∪ nysiis ∪ 2-char prefix — measured
#    recall 0.87 vs 0.46 for soundex alone under an adversarial typo model,
#    BENCH_BLOCKING.json), score the (given, surname) ensemble with
#    weights, keep pairs >= 0.85. Pass key="soundex" to trade recall for a
#    smaller pair budget.
i, j, s = st.dedup_records_blocked(
    [given_n, surname_n],
    measures=("jaro_winkler", "jaro_winkler"),
    weights=(1.0, 2.0),
    threshold=0.85,
    key_field=1,
)
print("\nduplicate-record candidates (record i ~ record j):")
for a, b, score in zip(i, j, s):
    print(f"  {score:.4f}  [{given[a]!r} {surname[a]!r}] ~ [{given[b]!r} {surname[b]!r}]")

# Note the record with a null given name matching every 'smith' at 1.0:
# missing="renormalize" (default) scores over the fields present on BOTH
# sides. missing="zero" charges absent fields as similarity 0 instead:
i0, j0, s0 = st.dedup_records_blocked(
    [given_n, surname_n], measures="jaro_winkler", weights=(1.0, 2.0),
    threshold=0.85, key_field=1, missing="zero",
)
print(f"\nwith missing='zero': {len(s0)} pairs (the null-given matches drop out)")

# 5) Query→candidate matching — same union default: candidates reachable
#    under soundex OR nysiis OR 2-char prefix compete:
idx, scores = st.top_k_matches_blocked(["fetherstone"], surname_n, "jaro_winkler", k=3)
print("\ntop matches for 'fetherstone':")
for c, v in zip(idx[0], scores[0]):
    if c >= 0:
        print(f"  {v:.4f}  {surname[c]!r}")

# 6) At scale the same calls stream: dedup_blocked_stream(...) yields
#    journal-restartable chunks; shard=rank/num_shards=P partitions key
#    groups across processes deterministically. See docs/API.md.
