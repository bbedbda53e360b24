"""Pure-Python per-pair oracle for all five measures.

This is the trusted scalar base (SURVEY.md §7 step 1): an independent, readable
implementation of the reference semantics, validated against the 1,115 golden
cases extracted from the reference test corpus
(src/expressions/strsim.rs:347-1535). The device kernels are tested for exact
integer-statistic agreement against this oracle, and the oracle is also the
exact fallback for rows longer than the largest device bucket.

Semantics frozen here (file:line cites refer to /root/reference):
  * per Unicode scalar value, not bytes (src/expressions/strsim.rs:133,138)
  * both-empty or equal → 1.0 for every measure (strsim.rs:128,182,288,324)
  * exactly one side empty → 0.0 for jaro/jaccard/dice (strsim.rs:184-186,
    290-291, 326-327); levenshtein reaches 0.0 through its own formula
  * levenshtein = 1 − dist/max(len) with unit costs (strsim.rs:146-160)
  * jaro: greedy windowed match with bound = max(len)/2 − 1, ordered-zip
    transposition count, integer t/2, len-1 special case (strsim.rs:197-243)
  * jaro-winkler: strict jaro > 0.7 gate, ≤4-char common prefix, 0.1 scale
    (strsim.rs:258-271)
  * jaccard / sørensen-dice: character-multiset min/max & min/sum folds
    (strsim.rs:297-306, 333-343) — anagrams score 1.0.

All arithmetic below follows the reference's f64 evaluation order exactly so
scores are bit-for-float identical.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, Tuple


def levenshtein_distance(a: str, b: str) -> int:
    """Unit-cost edit distance over Unicode scalars (rolling two-column DP)."""
    ca, cb = list(a), list(b)
    la, lb = len(ca), len(cb)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(la):
        cur = [i + 1] + [0] * lb
        ai = ca[i]
        for j in range(lb):
            sub = prev[j] if ai == cb[j] else prev[j] + 1
            cur[j + 1] = min(sub, prev[j + 1] + 1, cur[j] + 1)
        prev = cur
    return prev[lb]


def levenshtein(a: str, b: str) -> float:
    if (not a and not b) or a == b:
        return 1.0
    la, lb = len(list(a)), len(list(b))
    return 1.0 - (levenshtein_distance(a, b) / max(la, lb))


def jaro_stats(a: str, b: str) -> Tuple[int, int]:
    """(m, t_raw) — match count and raw transposition count (before //2).

    Greedy windowed matching: scan a's chars in order (only the first
    len_b + bound of them); for each, take the first unflagged equal b char in
    the window [i-bound, i+bound] ∩ [0, len_b).
    """
    ca, cb = list(a), list(b)
    la, lb = len(ca), len(cb)
    bound = max(la, lb) // 2 - 1
    flagged_a = [False] * la
    flagged_b = [False] * lb
    m = 0
    for i in range(min(la, lb + bound)):
        lo = max(0, i - bound)
        hi = min(i + bound, lb - 1)
        for j in range(lo, hi + 1):
            if ca[i] == cb[j] and not flagged_b[j]:
                m += 1
                flagged_a[i] = True
                flagged_b[j] = True
                break
    a_idx = [i for i, f in enumerate(flagged_a) if f]
    b_idx = [j for j, f in enumerate(flagged_b) if f]
    t = sum(1 for i, j in zip(a_idx, b_idx) if ca[i] != cb[j])
    return m, t


def jaro(a: str, b: str) -> float:
    if (not a and not b) or a == b:
        return 1.0
    if not a or not b:
        return 0.0
    ca, cb = list(a), list(b)
    la, lb = len(ca), len(cb)
    if la == 1 and lb == 1:
        return 1.0 if ca[0] == cb[0] else 0.0
    m, t = jaro_stats(a, b)
    if m == 0:
        return 0.0
    return (m / la + m / lb + (m - t // 2) / m) / 3.0


def shared_prefix_length(a: str, b: str) -> int:
    n = 0
    for ca, cb in list(zip(a, b))[:4]:
        if ca != cb:
            break
        n += 1
    return n


def jaro_winkler(a: str, b: str) -> float:
    js = jaro(a, b)
    if js > 0.7:
        return js + (shared_prefix_length(a, b) * 0.1 * (1.0 - js))
    return js


def _char_counts(a: str, b: str) -> Dict[str, Tuple[int, int]]:
    cnt_a, cnt_b = Counter(a), Counter(b)
    return {c: (cnt_a.get(c, 0), cnt_b.get(c, 0)) for c in set(cnt_a) | set(cnt_b)}


def multiset_intersection(a: str, b: str) -> int:
    return sum(min(x, y) for x, y in _char_counts(a, b).values())


def jaccard(a: str, b: str) -> float:
    if (not a and not b) or a == b:
        return 1.0
    if not a or not b:
        return 0.0
    num = 0
    den = 0
    for x, y in _char_counts(a, b).values():
        num += min(x, y)
        den += max(x, y)
    return num / den


def sorensen_dice(a: str, b: str) -> float:
    if (not a and not b) or a == b:
        return 1.0
    if not a or not b:
        return 0.0
    num = multiset_intersection(a, b)
    la, lb = len(list(a)), len(list(b))
    return 2.0 * num / (la + lb)


def _bigrams(s: str):
    return [s[i : i + 2] for i in range(len(s) - 1)]


def bigram_intersection(a: str, b: str) -> int:
    ca, cb = Counter(_bigrams(a)), Counter(_bigrams(b))
    return sum(min(ca[g], cb.get(g, 0)) for g in ca)


def jaccard_bigram(a: str, b: str) -> float:
    """EXTENSION (not in the reference): bigram-multiset Jaccard. Pairs with
    no bigrams on either side score 1.0 iff equal; one side without bigrams
    scores 0.0."""
    if a == b:
        return 1.0
    na, nb = max(len(a) - 1, 0), max(len(b) - 1, 0)
    if na == 0 or nb == 0:
        return 0.0
    inter = bigram_intersection(a, b)
    return inter / (na + nb - inter)


def sorensen_dice_bigram(a: str, b: str) -> float:
    """EXTENSION: bigram-multiset Sørensen-Dice (see jaccard_bigram)."""
    if a == b:
        return 1.0
    na, nb = max(len(a) - 1, 0), max(len(b) - 1, 0)
    if na == 0 or nb == 0:
        return 0.0
    return 2.0 * bigram_intersection(a, b) / (na + nb)


def cosine(a: str, b: str) -> float:
    """EXTENSION (not in the reference): Otsuka-Ochiai cosine over character
    multisets — inter / sqrt(la * lb). Equal/empty guards as the core
    multiset measures (both empty -> 1.0, one empty -> 0.0)."""
    if (not a and not b) or a == b:
        return 1.0
    if not a or not b:
        return 0.0
    import math

    return multiset_intersection(a, b) / math.sqrt(len(a) * len(b))


def overlap(a: str, b: str) -> float:
    """EXTENSION: overlap (Szymkiewicz-Simpson) coefficient over character
    multisets — inter / min(la, lb)."""
    if (not a and not b) or a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return multiset_intersection(a, b) / min(len(a), len(b))


def hamming(a: str, b: str) -> float:
    """EXTENSION: normalized Hamming similarity — positional matches over
    max(la, lb) (length difference counts as mismatches, the rapidfuzz
    padded convention)."""
    if not a and not b:
        return 1.0
    matches = sum(1 for x, y in zip(a, b) if x == y)
    return matches / max(len(a), len(b))


def lcs_length(a: str, b: str) -> int:
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return 0
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        ai = a[i - 1]
        for j in range(1, n + 1):
            cur[j] = prev[j - 1] + 1 if ai == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[n]


def lcs_seq(a: str, b: str) -> float:
    """EXTENSION: longest-common-subsequence similarity — lcs / max(la, lb)
    (textdistance LCSSeq normalization)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return lcs_length(a, b) / max(len(a), len(b))


def indel(a: str, b: str) -> float:
    """EXTENSION: normalized indel similarity — 1 - dist/(la+lb) with
    dist = la + lb - 2*lcs, i.e. 2*lcs / (la + lb) (the rapidfuzz Indel
    normalized_similarity convention: edit distance with insertions and
    deletions only)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 2.0 * lcs_length(a, b) / (len(a) + len(b))


def osa_distance(a: str, b: str) -> int:
    """OSA (restricted Damerau-Levenshtein) distance: unit-cost edit distance
    with adjacent-transposition, no substring edited twice (classic 3-row DP)."""
    ca, cb = list(a), list(b)
    la, lb = len(ca), len(cb)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = [0] * (lb + 1)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = ca[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == cb[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and ai == cb[j - 2] and ca[i - 2] == cb[j - 1]:
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return prev[lb]


def osa(a: str, b: str) -> float:
    """EXTENSION: OSA similarity — 1 - osa_distance/max(la, lb) (the
    restricted Damerau-Levenshtein most libraries call 'damerau'; same
    normalization and empty/equal semantics as levenshtein)."""
    if (not a and not b) or a == b:
        return 1.0
    la, lb = len(list(a)), len(list(b))
    return 1.0 - (osa_distance(a, b) / max(la, lb))


# digit class per letter A..Z (see ops/phonetic.py for the full spec)
_SOUNDEX_DIGITS = "01230120022455012623010202"


def soundex_code(s: str) -> str:
    """American Soundex code with the H/W rule (spec: ops/phonetic.py).

    Letters outside [A-Za-z] are skipped; a string with no letters codes to
    the empty string. "Robert" → "R163", "Lee" → "L000"."""
    first = ""
    prev = 0
    digits: list = []
    for ch in s:
        c = ord(ch)
        if 65 <= c <= 90:
            u = c
        elif 97 <= c <= 122:
            u = c - 32
        else:
            continue
        d = int(_SOUNDEX_DIGITS[u - 65])
        if not first:
            first = chr(u)
            prev = d
            continue
        if d != 0 and d != prev and len(digits) < 3:
            digits.append(d)
        if u != 72 and u != 87:  # H and W are transparent to "previous"
            prev = d
    if not first:
        return ""
    return first + "".join(str(d) for d in digits) + "0" * (3 - len(digits))


def nysiis_code(s: str) -> str:
    """NYSIIS phonetic code (the original 1970 NYSIIS rule set, no length
    truncation — the variant most modern libraries implement).

    Only ASCII letters participate (case-insensitive); every other character
    is dropped before encoding; no letters → empty code. Mirrored exactly by
    the C++ batch key generator (native/strsim_host.cpp:nysiis_code) and
    differentially tested against it."""
    u = [c for c in s.upper() if "A" <= c <= "Z"]
    if not u:
        return ""
    w = "".join(u)
    # first-char transforms
    if w.startswith("MAC"):
        w = "MCC" + w[3:]
    elif w.startswith("KN"):
        w = "NN" + w[2:]
    elif w.startswith("K"):
        w = "C" + w[1:]
    elif w.startswith(("PH", "PF")):
        w = "FF" + w[2:]
    elif w.startswith("SCH"):
        w = "SSS" + w[3:]
    # last-char transforms
    if w.endswith(("EE", "IE")):
        w = w[:-2] + "Y"
    elif w.endswith(("DT", "RT", "RD", "NT", "ND")):
        w = w[:-2] + "D"
    key = [w[0]]
    i = 1
    n = len(w)
    vowels = "AEIOU"
    while i < n:
        c = w[i]
        step = 1
        if c == "E" and i + 1 < n and w[i + 1] == "V":
            rep = "AF"
            step = 2
        elif c in vowels:
            rep = "A"
        elif c == "Q":
            rep = "G"
        elif c == "Z":
            rep = "S"
        elif c == "M":
            rep = "N"
        elif c == "K":
            if i + 1 < n and w[i + 1] == "N":
                rep = "N"
                step = 2
            else:
                rep = "C"
        elif c == "S" and w[i : i + 3] == "SCH":
            rep = "SSS"
            step = 3
        elif c == "P" and i + 1 < n and w[i + 1] == "H":
            rep = "FF"
            step = 2
        elif c == "H" and (w[i - 1] not in vowels or (i + 1 < n and w[i + 1] not in vowels)):
            rep = w[i - 1]
        elif c == "W" and w[i - 1] in vowels:
            rep = w[i - 1]
        else:
            rep = c
        for r in rep:
            if r != key[-1]:
                key.append(r)
        i += step
    # terminal cleanup: trailing S, trailing AY -> Y, trailing A
    if len(key) > 1 and key[-1] == "S":
        key.pop()
    if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
        del key[-2]
    if len(key) > 1 and key[-1] == "A":
        key.pop()
    return "".join(key)


def soundex(a: str, b: str) -> float:
    """EXTENSION: soundex phonetic equality — 1.0 iff the codes match
    (two letterless strings share the empty code); one side empty → 0.0,
    both empty → 1.0, matching the engine-wide empty conventions."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 1.0 if soundex_code(a) == soundex_code(b) else 0.0


ORACLES = {
    "levenshtein": levenshtein,
    "jaro": jaro,
    "jaro_winkler": jaro_winkler,
    "jaccard": jaccard,
    "sorensen_dice": sorensen_dice,
    "jaccard_bigram": jaccard_bigram,
    "sorensen_dice_bigram": sorensen_dice_bigram,
    "cosine": cosine,
    "overlap": overlap,
    "hamming": hamming,
    "lcs_seq": lcs_seq,
    "indel": indel,
    "osa": osa,
    "soundex": soundex,
}
