"""Blocking (candidate generation) for record linkage at scale.

EXTENSION — the reference scores rows it is given (a Polars expression is
already a materialized pair list); production entity resolution needs the
step BEFORE scoring: cut the Q×C cross product down to candidate pairs worth
scoring. This module provides the two standard blocking strategies —
phonetic/equality key blocking and sorted-neighborhood windows — wired
directly into this engine's batch pipeline, so the surviving pairs are scored
by the production device kernels with EXACT host-f64 finalization (unlike
models/linkage.py's brute-force f32 serving path, the scores returned here
are bit-identical to `compute`).

Design: encode each column ONCE, generate (query_index, candidate_index)
pairs from key groups with pure numpy, then score pair chunks by GATHERING
encoded tiles (fancy indexing — no re-encode) through
models/pipeline.compute_scores. Per-query top-k is one lexsort per chunk
merge. Everything is deterministic: ties break by ascending candidate index.

Key functions are pluggable; built-ins (a tuple unions several keys):
  "soundex"  — American Soundex (ops/phonetic.py spec), numpy-vectorized
               host implementation differentially tested vs the oracle
  "nysiis"   — NYSIIS codes (finer blocks; threaded C++ batch encoder)
  "prefix"   — first 2 codepoints, case-folded (ASCII)
  callable   — any fn(list[str|None]) -> np.ndarray of hashable keys
Rows with no keyable content (nulls; empty/letterless strings under the
built-ins) never block.

Oversized blocks (a very common key — e.g. soundex S530 over US surnames)
are governed by `oversize`: "keep" scores them all, "skip" drops the block
with a warning (standard ER practice: re-block such keys with a finer key),
"error" raises.
"""
from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np

from strsim_tpu.config import StrsimConfig, get_config
from strsim_tpu.models.measures import resolve_measures
from strsim_tpu.models.pipeline import compute_scores
from strsim_tpu.utils import encode as enc

__all__ = [
    "DEFAULT_BLOCKING_KEYS",
    "soundex_keys",
    "nysiis_keys",
    "unpack_soundex",
    "blocked_pairs",
    "iter_blocked_pairs",
    "top_k_matches_blocked",
    "top_k_matches_multi_blocked",
    "dedup_blocked",
    "dedup_blocked_stream",
    "dedup_records_blocked",
    "dedup_sorted_neighborhood",
]

# Default blocking policy: the 3-key UNION, not a single key. Measured under
# the adversarial one-substitution typo model (BENCH_BLOCKING.json
# recall_at_1): single keys recall 0.46 (soundex) / 0.13 (nysiis) /
# 0.82 (prefix); the union recalls 0.87 at a 0.65% pair budget — the
# defensible default for an ER pipeline. Pass a single key to trade recall
# for a smaller pair budget.
DEFAULT_BLOCKING_KEYS: Tuple[str, ...] = ("soundex", "nysiis", "prefix")

# digit class per letter A..Z — same table as ops/phonetic.py
_SOUNDEX_DIGITS = np.array(
    [0, 1, 2, 3, 0, 1, 2, 0, 0, 2, 2, 4, 5, 5, 0, 1, 2, 6, 2, 3, 0, 1, 0, 2, 0, 2],
    dtype=np.int32,
)


def _soundex_keys_encoded(col: enc.EncodedColumn) -> np.ndarray:
    """Packed soundex codes for an encoded column: [N] int32, -1 at null
    rows, 0 for letterless strings. Numpy-vectorized state machine over
    string positions — the host mirror of ops/phonetic.py:soundex_code
    (differentially tested against the oracle and the device kernel)."""
    n = col.n
    codes = col.codes
    first = np.zeros(n, dtype=np.int32)
    prev = np.zeros(n, dtype=np.int32)
    count = np.zeros(n, dtype=np.int32)
    code = np.zeros(n, dtype=np.int32)
    pow10 = np.array([100, 10, 1, 0], dtype=np.int32)
    l_max = int(col.lengths.max()) if n else 0
    for i in range(min(l_max, col.width)):
        c = codes[:, i].astype(np.int32)
        is_up = (c >= 65) & (c <= 90)
        is_lo = (c >= 97) & (c <= 122)
        u = np.where(is_lo, c - 32, c)
        is_letter = is_up | is_lo
        d = np.where(is_letter, _SOUNDEX_DIGITS[np.clip(u - 65, 0, 25)], 0)
        is_hw = (u == 72) | (u == 87)
        no_first = first == 0
        emit = is_letter & ~no_first & (d != 0) & (d != prev) & (count < 3)
        code = np.where(emit, code + d * pow10[np.clip(count, 0, 3)], code)
        count = np.where(emit, count + 1, count)
        first = np.where(is_letter & no_first, u, first)
        prev = np.where(is_letter, np.where(no_first, d, np.where(is_hw, prev, d)), prev)
    out = np.where(first == 0, 0, first * 1000 + code).astype(np.int32)
    out[~col.validity] = -1
    return out


def soundex_keys(col) -> np.ndarray:
    """Packed int32 soundex codes for a string column (list / array /
    EncodedColumn): `ord(first_letter)*1000 + d1*100 + d2*10 + d3`; 0 for
    letterless strings, -1 for nulls. See unpack_soundex for display."""
    if not isinstance(col, enc.EncodedColumn):
        col = enc.encode_column(col, pad=enc.PAD_A)
    return _soundex_keys_encoded(col)


def unpack_soundex(packed: Union[int, np.ndarray]):
    """Packed int32 code(s) → display string(s): 82163 → "R163", 0 → "",
    -1 (null) → None."""
    def one(p: int):
        p = int(p)
        if p < 0:
            return None
        if p == 0:
            return ""
        return chr(p // 1000) + f"{p % 1000:03d}"

    if np.isscalar(packed) or isinstance(packed, (int, np.integer)):
        return one(packed)
    return [one(p) for p in np.asarray(packed).ravel()]


def nysiis_keys(col) -> np.ndarray:
    """NYSIIS phonetic codes for a string column: object ndarray of str
    (None at null rows, "" for letterless strings). NYSIIS distinguishes
    surname variants soundex merges (finer blocks) while still folding
    spelling variation. Host-side only (the device measure family uses
    soundex); cost is amortized over DISTINCT values — repeated names are
    encoded once."""
    from strsim_tpu.ops.oracle import nysiis_code

    if isinstance(col, enc.EncodedColumn):
        raise TypeError("nysiis_keys takes raw string columns, not EncodedColumn")
    if hasattr(col, "to_list"):
        col = col.to_list()
    arr = np.empty(len(col), dtype=object)
    arr[:] = list(col)
    try:  # threaded C++ batch encoder (bit-identical to the oracle)
        from strsim_tpu.native.binding import native_phonetic_codes

        col_enc = enc.encode_column(arr, pad=enc.PAD_A)
        # NYSIIS codes are at most as long as the letter count, so sizing
        # the buffer to the longest row keeps native == oracle even for
        # unsplit >32-char fields (the binding default would truncate)
        kw = int(max(8, col_enc.lengths.max() + 1)) if col_enc.n else 8
        return native_phonetic_codes(col_enc, "nysiis", key_width=kw)
    except Exception:
        pass  # no toolchain: oracle over distinct values
    valid = np.array([s is not None for s in arr], dtype=bool)
    vals = arr[valid].astype("U")
    uniq, inv = np.unique(vals, return_inverse=True)
    codes = np.empty(uniq.size, dtype=object)
    for i, s in enumerate(uniq):
        codes[i] = nysiis_code(s)
    out = np.full(arr.shape[0], None, dtype=object)
    out[valid] = codes[inv]
    return out


def _prefix_keys(col: enc.EncodedColumn, n_chars: int = 2) -> np.ndarray:
    """Case-folded (ASCII) first-n-codepoint keys packed into int64; -1 at
    null rows. Strings shorter than n_chars key on what they have."""
    k = min(n_chars, col.width) if col.width else 0
    out = np.zeros(col.n, dtype=np.int64)
    for i in range(k):
        c = col.codes[:, i].astype(np.int64)
        c = np.where(c < 0, 0, c)  # pad → 0 slot
        c = np.where((c >= 65) & (c <= 90), c + 32, c)  # ASCII fold
        out = out * (1 << 21) + c  # codepoints < 2^21
    out[~col.validity] = -1
    return out


def _keys_for(col: enc.EncodedColumn, raw, key) -> np.ndarray:
    """Blocking keys for a column; rows that must never block (nulls, and —
    for the built-in keys — rows with no keyable content: empty strings,
    letterless strings under phonetic keys) come back as -1 / None. Without
    that exclusion a corpus encoding missing values as "" would form one
    quadratic block of score-1.0 non-matches (standard ER treats empty like
    missing). Callable keys own their semantics: only nulls are masked."""
    if callable(key):
        keys = np.asarray(key(raw))
        if keys.shape[0] != col.n:
            raise ValueError(
                f"key function returned {keys.shape[0]} keys for {col.n} rows"
            )
        # nulls never block
        if keys.dtype.kind == "i":
            keys = keys.copy()
            keys[~col.validity] = -1
            return keys
        if keys.dtype.kind == "u":
            # unsigned can't hold the -1 null marker (and a bijective int64
            # cast could collide a real 2^64-1 key with it): go via objects
            keys_obj = keys.astype(object)
            keys_obj[~col.validity] = None
            return keys_obj
        keys_obj = keys.astype(object)
        keys_obj[~col.validity] = None
        return keys_obj
    if key == "soundex":
        k = _soundex_keys_encoded(col)
        k[k == 0] = -1  # letterless / empty: no phonetic content
        return k
    if key == "nysiis":
        k = nysiis_keys(raw)
        k[k == ""] = None  # letterless / empty
        return k
    if key == "prefix":
        k = _prefix_keys(col)
        k[col.lengths == 0] = -1  # empty strings never block
        return k
    raise ValueError(
        f"unknown blocking key {key!r}; use 'soundex', 'nysiis', 'prefix', "
        "or a callable"
    )


def _valid_key_mask(keys: np.ndarray) -> np.ndarray:
    if keys.dtype.kind in "iu":
        return keys >= 0
    return np.array([k is not None for k in keys], dtype=bool)


def _concat_fast(parts) -> np.ndarray:
    """np.concatenate into a pre-faulted buffer: plain concatenate's fresh
    allocation is page-fault-bound in this environment (measured 16.6 s vs
    0.3 s at 450 MB — utils/alloc.py)."""
    from strsim_tpu.utils.alloc import fast_empty

    total = sum(p.size for p in parts)
    out = fast_empty((total,), parts[0].dtype if parts else np.int64)
    off = 0
    for p in parts:
        out[off : off + p.size] = p
        off += p.size
    return out


def _group_shards(shared: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic shard id per key group (process-salt-free, so every
    process computes the same partition): multixed int keys, crc32 for
    object keys."""
    if shared.dtype.kind in "iu":
        mixed = (shared.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return (mixed % np.uint64(num_shards)).astype(np.int64)
    import zlib

    return np.array(
        [zlib.crc32(str(k).encode("utf-8")) % num_shards for k in shared],
        dtype=np.int64,
    )


def _first_key_owned(prev_keys, qi: np.ndarray, ci: np.ndarray) -> np.ndarray:
    """Mask of pairs NOT blocked by any earlier key spec: under a multi-key
    union, a pair blocked by several keys is OWNED by its first blocking key.
    Later keys skip it, so each pair is scored once (instead of scored per
    key and deduped at the end) and, under key-group sharding, emitted by
    exactly one worker. prev_keys: [(keys_array, valid_mask), ...]."""
    own = np.ones(qi.shape[0], dtype=bool)
    for ke, vm in prev_keys:
        own &= ~(vm[qi] & vm[ci] & (ke[qi] == ke[ci]))
    return own


def iter_blocked_pairs(
    query_keys: np.ndarray,
    cand_keys: np.ndarray,
    *,
    exclude_self: bool = False,
    ordered_only: bool = False,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
    chunk_pairs: int = 2_000_000,
    shard: Optional[int] = None,
    num_shards: int = 1,
):
    """Yield (qi, ci) chunks of ≤ ~chunk_pairs candidate pairs from key
    equality: all pairs with query_keys[qi] == cand_keys[ci]; keys < 0 / None
    never block.

    exclude_self drops qi == ci (self-join dedup); ordered_only keeps only
    ci < qi (emit each unordered pair once). max_block_candidates + oversize
    govern blocks whose candidate side exceeds the limit ("keep"/"skip"/
    "error").

    Multi-process partitioning: with shard/num_shards set, only key groups
    whose deterministic shard id (_group_shards — identical on every
    process) equals `shard` are emitted; the union over shards is exactly
    the full pair set, disjoint, so P workers each running
    `dedup_blocked(names, shard=rank, num_shards=P)` cover a corpus with no
    coordination beyond concatenating results.

    Chunked BY DESIGN: a 1M-row self-join easily produces 10⁸-10⁹ pairs, and
    materializing index arrays at that scale is allocator-bound in this
    environment (fresh multi-GB numpy temporaries fault at ~0.2-1 GB/s, see
    utils/alloc.py) — per-group numpy ops into small reused buffers measured
    ~20× faster end-to-end than the fully-vectorized segmented-cartesian
    formulation. Pair order is deterministic: blocks in key-sort order,
    query-major within a block, original index order within each side.
    Oversized groups are split by query rows, so one huge block still streams
    in bounded chunks."""
    if oversize not in ("keep", "skip", "error"):
        raise ValueError("oversize must be 'keep', 'skip', or 'error'")
    qm = _valid_key_mask(query_keys)
    cm = _valid_key_mask(cand_keys)
    q_idx = np.nonzero(qm)[0]
    c_idx = np.nonzero(cm)[0]
    if q_idx.size == 0 or c_idx.size == 0:
        return
    qk = query_keys[q_idx]
    ck = cand_keys[c_idx]
    # group both sides by key (np.unique sorts, so shared keys align)
    q_order = np.argsort(qk, kind="stable")
    c_order = np.argsort(ck, kind="stable")
    uq, q_start, q_cnt = np.unique(qk[q_order], return_index=True, return_counts=True)
    uc, c_start, c_cnt = np.unique(ck[c_order], return_index=True, return_counts=True)
    shared, qpos, cpos = np.intersect1d(uq, uc, return_indices=True)
    if shared.size == 0:
        return
    if shard is not None:
        if not (0 <= shard < num_shards):
            raise ValueError(f"shard {shard} out of range for num_shards {num_shards}")
        keep = _group_shards(shared, num_shards) == shard
        shared, qpos, cpos = shared[keep], qpos[keep], cpos[keep]
        if shared.size == 0:
            return

    n_skipped = 0
    buf_q, buf_c, buffered = [], [], 0
    for g in range(shared.size):
        csz = int(c_cnt[cpos[g]])
        if max_block_candidates is not None and csz > max_block_candidates:
            if oversize == "error":
                raise ValueError(
                    f"block {shared[g]!r} has {csz} candidates "
                    f"(max_block_candidates={max_block_candidates})"
                )
            if oversize == "skip":
                n_skipped += 1
                if n_skipped == 1:
                    # warn IMMEDIATELY (a consumer that stops early must
                    # still learn blocks were dropped); aggregate at the end
                    warnings.warn(
                        f"blocking: skipping oversized block {shared[g]!r} "
                        f"({csz} > {max_block_candidates} candidates); "
                        "re-block such keys with a finer key (further "
                        "skips aggregated at end of iteration)",
                        RuntimeWarning,
                    )
                continue
        qs = q_idx[q_order[q_start[qpos[g]] : q_start[qpos[g]] + q_cnt[qpos[g]]]]
        cs = c_idx[c_order[c_start[cpos[g]] : c_start[cpos[g]] + csz]]
        # bound BOTH sides so one huge block still streams in <= ~chunk_pairs
        # chunks: slice candidates first, then query rows per slice
        for clo in range(0, csz, chunk_pairs):
            cs_part = cs[clo : clo + chunk_pairs]
            cn = cs_part.size
            rows_per = max(1, chunk_pairs // max(cn, 1))
            for lo in range(0, qs.size, rows_per):
                qpart = qs[lo : lo + rows_per]
                qq = np.repeat(qpart, cn)
                cx = np.tile(cs_part, qpart.size)
                if exclude_self or ordered_only:
                    keep = (cx < qq) if ordered_only else (cx != qq)
                    qq, cx = qq[keep], cx[keep]
                if qq.size:
                    buf_q.append(qq)
                    buf_c.append(cx)
                    buffered += qq.size
                if buffered >= chunk_pairs:
                    yield (
                        np.concatenate(buf_q).astype(np.int64),
                        np.concatenate(buf_c).astype(np.int64),
                    )
                    buf_q, buf_c, buffered = [], [], 0
    if n_skipped > 1:
        warnings.warn(
            f"blocking: skipped {n_skipped} oversized block(s) "
            f"(> {max_block_candidates} candidates); re-block such keys "
            "with a finer key",
            RuntimeWarning,
        )
    if buffered:
        yield (
            np.concatenate(buf_q).astype(np.int64),
            np.concatenate(buf_c).astype(np.int64),
        )


def blocked_pairs(
    query_keys: np.ndarray,
    cand_keys: np.ndarray,
    *,
    exclude_self: bool = False,
    ordered_only: bool = False,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
) -> Tuple[np.ndarray, np.ndarray]:
    """Materialized form of iter_blocked_pairs (same semantics and order) —
    convenient for tests and moderate pair counts; the scoring entry points
    stream the iterator instead and never hold the full pair list."""
    chunks = list(
        iter_blocked_pairs(
            query_keys,
            cand_keys,
            exclude_self=exclude_self,
            ordered_only=ordered_only,
            max_block_candidates=max_block_candidates,
            oversize=oversize,
        )
    )
    z = np.zeros(0, dtype=np.int64)
    if not chunks:
        return z, z
    return _concat_fast([q for q, _ in chunks]), _concat_fast([c for _, c in chunks])


def _maybe_pre(col, steps):
    if steps is None:
        return col
    from strsim_tpu.utils.preprocess import preprocess_column

    return preprocess_column(col, steps)


def _gather(col: enc.EncodedColumn, idx: np.ndarray) -> enc.EncodedColumn:
    return enc.EncodedColumn(
        codes=col.codes[idx],
        lengths=col.lengths[idx],
        validity=col.validity[idx],
    )


def _score_pairs(
    q: enc.EncodedColumn,
    c: enc.EncodedColumn,
    qi: np.ndarray,
    ci: np.ndarray,
    measure: str,
    cfg: StrsimConfig,
    pair_chunk: int,
) -> np.ndarray:
    """Exact f64 scores for (qi, ci) pairs by gathering pre-encoded tiles
    through the batch pipeline, pair_chunk rows per slice."""
    scores = np.empty(qi.size, dtype=np.float64)
    for lo in range(0, qi.size, pair_chunk):
        hi = min(lo + pair_chunk, qi.size)
        res = compute_scores(
            _gather(q, qi[lo:hi]), _gather(c, ci[lo:hi]), (measure,), config=cfg
        )
        scores[lo:hi] = res[measure][0]
    return scores


def _segment_topk(
    qi: np.ndarray, ci: np.ndarray, scores: np.ndarray, n_queries: int, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """[Q, k] (indices, scores) from flat per-pair scores: per query take the
    k best, ties broken by ascending candidate index; missing slots -1/NaN."""
    idx_out = np.full((n_queries, k), -1, dtype=np.int64)
    sco_out = np.full((n_queries, k), np.nan, dtype=np.float64)
    if qi.size == 0 or k <= 0:
        return idx_out, sco_out
    finite = np.isfinite(scores)  # null candidates score NaN → drop
    qi, ci, scores = qi[finite], ci[finite], scores[finite]
    if qi.size == 0:
        return idx_out, sco_out
    order = np.lexsort((ci, -scores, qi))  # qi primary, score desc, ci asc
    sq = qi[order]
    seg_start = np.zeros(sq.size, dtype=np.int64)
    new_seg = np.nonzero(np.diff(sq))[0] + 1
    seg_start[new_seg] = new_seg
    np.maximum.accumulate(seg_start, out=seg_start)
    rank = np.arange(sq.size, dtype=np.int64) - seg_start
    keep = rank < k
    idx_out[sq[keep], rank[keep]] = ci[order][keep]
    sco_out[sq[keep], rank[keep]] = scores[order][keep]
    return idx_out, sco_out


def top_k_matches_blocked(
    queries,
    candidates,
    measure: str = "jaro_winkler",
    k: int = 5,
    *,
    key: Union[str, Callable, Sequence] = DEFAULT_BLOCKING_KEYS,
    config: Optional[StrsimConfig] = None,
    pair_chunk: int = 2_000_000,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Blocked top-k matching: like models/linkage.top_k_matches, but only
    candidates sharing the query's blocking key are scored — the Q×C cross
    product shrinks to the blocked pair count (typically 100-1000× fewer),
    which is what makes 1M×1M linkage tractable.

    `key` defaults to the 3-key UNION (DEFAULT_BLOCKING_KEYS): candidates
    matching the query under ANY key compete — the standard multi-key union
    that buys back the recall a single key loses to typos in its sensitive
    positions (measured recall 0.87 for the union vs 0.46 single-key soundex
    under the adversarial typo model, BENCH_BLOCKING.json recall_at_1).
    Pass one key (e.g. key="soundex") for a smaller pair budget. A candidate
    reachable via several keys is scored once per key (scores are identical)
    and deduplicated before ranking.

    Returns (indices [Q, k] int64, scores [Q, k] f64 — EXACT host-f64
    finalization, bit-identical to `compute` on the same pairs). Queries with
    no same-key candidate (or null queries) get -1 / NaN rows. Deterministic:
    score ties break by ascending candidate index."""
    (measure,) = resolve_measures(measure)
    cfg = config or get_config()
    queries = _maybe_pre(queries, preprocess)
    candidates = _maybe_pre(candidates, preprocess)
    q = enc.encode_column(queries, pad=enc.PAD_A)
    c = enc.encode_column(candidates, pad=enc.PAD_B)
    keys_list = list(key) if isinstance(key, (tuple, list)) else [key]
    # stream pair chunks: score each, keep only its per-query top-k triples,
    # then merge — the full pair list is never materialized
    part_q, part_c, part_s = [], [], []
    for kspec in keys_list:
        qk = _keys_for(q, queries, kspec)
        ck = _keys_for(c, candidates, kspec)
        for qi, ci in iter_blocked_pairs(
            qk,
            ck,
            max_block_candidates=max_block_candidates,
            oversize=oversize,
            chunk_pairs=pair_chunk,
        ):
            scores = _score_pairs(q, c, qi, ci, measure, cfg, pair_chunk)
            ti, ts = _segment_topk(qi, ci, scores, q.n, k)
            m = ti >= 0
            rr, _ = np.nonzero(m)
            part_q.append(rr.astype(np.int64))
            part_c.append(ti[m])
            part_s.append(ts[m])
    if not part_q:
        return (
            np.full((q.n, max(k, 0)), -1, dtype=np.int64),
            np.full((q.n, max(k, 0)), np.nan, dtype=np.float64),
        )
    allq = np.concatenate(part_q)
    allc = np.concatenate(part_c)
    alls = np.concatenate(part_s)
    if len(keys_list) > 1:  # a pair found via several keys ranks once
        packed = allq * np.int64(max(c.n, 1)) + allc
        _, first = np.unique(packed, return_index=True)
        allq, allc, alls = allq[first], allc[first], alls[first]
    return _segment_topk(allq, allc, alls, q.n, k)


def dedup_blocked(
    names,
    measure: str = "jaro_winkler",
    threshold: float = 0.9,
    *,
    key: Union[str, Callable, Sequence] = DEFAULT_BLOCKING_KEYS,
    config: Optional[StrsimConfig] = None,
    pair_chunk: int = 2_000_000,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
    shard: Optional[int] = None,
    num_shards: int = 1,
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Blocked self-join dedup; `key` defaults to the 3-key union
    (DEFAULT_BLOCKING_KEYS — measured recall 0.87 vs 0.46 single-key
    soundex, BENCH_BLOCKING.json; pairs blocked by several keys are emitted
    once): score every unordered same-key pair once and
    return (i, j, scores) for pairs with score >= threshold, sorted by score
    descending (ties: ascending i, then j). i > j by construction; exact-f64
    scores; null rows never pair."""
    (measure,) = resolve_measures(measure)
    cfg = config or get_config()
    names = _maybe_pre(names, preprocess)
    a = enc.encode_column(names, pad=enc.PAD_A)
    b = enc.encode_column(names, pad=enc.PAD_B)
    keys_list = list(key) if isinstance(key, (tuple, list)) else [key]
    multi = len(keys_list) > 1
    # Blocks are only ever DROPPED under oversize="skip" with a limit set;
    # everywhere else "an earlier key blocks this pair" ⇔ "an earlier key
    # enumerated this pair", which first-key ownership relies on.
    no_drops = max_block_candidates is None or oversize != "skip"
    # Multi-key union + sharding. Preferred scheme (no_drops): shard KEY
    # GROUPS per key spec — enumeration itself is sharded (each worker walks
    # only its own groups), and first-key ownership (_first_key_owned) keeps
    # a pair blocked by several keys in exactly one worker: the pair's first
    # blocking key has one group, that group one shard. Fallback (droppable
    # blocks): every worker enumerates ALL pairs and keeps its slice by pair
    # hash — correct but duplicates enumeration cost across workers.
    pair_shard = shard is not None and multi and not no_drops
    if shard is not None and not (0 <= shard < num_shards):
        raise ValueError(f"shard {shard} out of range for num_shards {num_shards}")
    # stream pair chunks; only pairs clearing the threshold are retained
    out_i, out_j, out_s = [], [], []
    prev_keys = []
    for kspec in keys_list:
        keys = _keys_for(a, names, kspec)
        for qi, ci in iter_blocked_pairs(
            keys,
            keys,
            ordered_only=True,
            max_block_candidates=max_block_candidates,
            oversize=oversize,
            chunk_pairs=pair_chunk,
            shard=None if pair_shard else shard,
            num_shards=1 if pair_shard else num_shards,
        ):
            if prev_keys and no_drops:
                own = _first_key_owned(prev_keys, qi, ci)
                qi, ci = qi[own], ci[own]
                if qi.size == 0:
                    continue
            if pair_shard:
                packed = (qi * np.int64(max(a.n, 1)) + ci).astype(np.uint64)
                mix = (packed * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
                keep = (mix % np.uint64(num_shards)).astype(np.int64) == shard
                qi, ci = qi[keep], ci[keep]
                if qi.size == 0:
                    continue
            scores = _score_pairs(a, b, qi, ci, measure, cfg, pair_chunk)
            hit = np.isfinite(scores) & (scores >= threshold)
            out_i.append(qi[hit])
            out_j.append(ci[hit])
            out_s.append(scores[hit])
        if multi and no_drops:
            prev_keys.append((keys, _valid_key_mask(keys)))
    if not out_i:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    qi = _concat_fast(out_i)
    ci = _concat_fast(out_j)
    scores = _concat_fast(out_s)
    if len(keys_list) > 1:  # a pair blocked by several keys is emitted once
        packed = qi * np.int64(max(a.n, 1)) + ci
        _, first = np.unique(packed, return_index=True)
        qi, ci, scores = qi[first], ci[first], scores[first]
    order = np.lexsort((ci, qi, -scores))
    return qi[order], ci[order], scores[order]


def _ensemble_score_pairs(
    qa_cols, cb_cols, qi, ci, measures, weights, missing, cfg
) -> np.ndarray:
    """Exact-f64 weighted ensemble scores for (qi, ci) record pairs over
    PRE-ENCODED per-field columns (qa_cols encoded PAD_A, cb_cols PAD_B) —
    same combine semantics as models/linkage.ensemble_scores, but gathering
    tiles instead of re-encoding raw strings every chunk (the encode-once
    design the single-field path uses)."""
    num = den = any_valid = None
    for f, m in enumerate(measures):
        res = compute_scores(
            _gather(qa_cols[f], qi), _gather(cb_cols[f], ci), (m,), config=cfg
        )
        vals, validity = res[m]
        contrib = np.where(validity, vals, 0.0) * weights[f]
        wmask = np.where(validity, weights[f], 0.0)
        num = contrib if num is None else num + contrib
        den = wmask if den is None else den + wmask
        any_valid = validity if any_valid is None else (any_valid | validity)
    if missing == "zero":
        den = np.where(any_valid, float(sum(weights)), 0.0)
    out = np.full(num.shape, np.nan, dtype=np.float64)
    ok = any_valid & (den > 0)
    np.divide(num, den, out=out, where=ok)
    out[~ok] = np.nan
    return out


def _obj_cols(fields: Sequence) -> list:
    cols = []
    for f in fields:
        if hasattr(f, "to_list"):
            f = f.to_list()
        arr = np.empty(len(f), dtype=object)
        arr[:] = list(f)
        cols.append(arr)
    return cols


def top_k_matches_multi_blocked(
    query_fields: Sequence,
    candidate_fields: Sequence,
    measures: Union[str, Sequence[str]] = "jaro_winkler",
    weights: Optional[Sequence[float]] = None,
    k: int = 5,
    *,
    key_field: int = 0,
    key: Union[str, Callable, Sequence] = DEFAULT_BLOCKING_KEYS,
    missing: str = "renormalize",
    config: Optional[StrsimConfig] = None,
    pair_chunk: int = 2_000_000,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Blocked multi-field record matching: like
    models/linkage.top_k_matches_multi, but only candidate records sharing
    the query's blocking key (computed on field `key_field`) are scored —
    the blocked counterpart completing the API matrix
    (top_k_matches / top_k_matches_multi / top_k_matches_blocked / this).
    `key` defaults to the 3-key union (DEFAULT_BLOCKING_KEYS; see
    top_k_matches_blocked); records reachable via several keys rank once.

    Returns (indices [Q, k] int64, scores [Q, k] f64 — EXACT ensemble
    scores, byte-identical to models/linkage.ensemble_scores on the same
    record pairs). Ties break by ascending candidate index."""
    F = len(query_fields)
    if F == 0 or len(candidate_fields) != F:
        raise ValueError(
            f"need matching non-empty field lists, got {F} / {len(candidate_fields)}"
        )
    if not (0 <= key_field < F):
        raise ValueError(f"key_field {key_field} out of range for {F} fields")
    qcols = [_maybe_pre(c, preprocess) for c in _obj_cols(query_fields)]
    ccols = [_maybe_pre(c, preprocess) for c in _obj_cols(candidate_fields)]
    nq = qcols[0].shape[0]
    if any(c.shape[0] != nq for c in qcols):
        raise ValueError("all query fields must have the same length")
    if any(c.shape[0] != ccols[0].shape[0] for c in ccols):
        raise ValueError("all candidate fields must have the same length")
    if missing not in ("renormalize", "zero"):
        raise ValueError(f"missing must be 'renormalize' or 'zero', got {missing!r}")
    from strsim_tpu.models.linkage import _normalize_fields

    measures_t, weights_t = _normalize_fields(measures, weights, F)
    cfg = config or get_config()
    # encode every field ONCE; chunks gather tiles (no per-chunk re-encode)
    qa_cols = [enc.encode_column(c, pad=enc.PAD_A) for c in qcols]
    cb_cols = [enc.encode_column(c, pad=enc.PAD_B) for c in ccols]
    keys_list = list(key) if isinstance(key, (tuple, list)) else [key]
    part_q, part_c, part_s = [], [], []
    for kspec in keys_list:
        qkeys = _keys_for(qa_cols[key_field], qcols[key_field], kspec)
        ckeys = _keys_for(cb_cols[key_field], ccols[key_field], kspec)
        for qi, ci in iter_blocked_pairs(
            qkeys,
            ckeys,
            max_block_candidates=max_block_candidates,
            oversize=oversize,
            chunk_pairs=pair_chunk,
        ):
            scores = _ensemble_score_pairs(
                qa_cols, cb_cols, qi, ci, measures_t, weights_t, missing, cfg
            )
            ti, ts = _segment_topk(qi, ci, scores, nq, k)
            m = ti >= 0
            rr, _ = np.nonzero(m)
            part_q.append(rr.astype(np.int64))
            part_c.append(ti[m])
            part_s.append(ts[m])
    if not part_q:
        return (
            np.full((nq, max(k, 0)), -1, dtype=np.int64),
            np.full((nq, max(k, 0)), np.nan, dtype=np.float64),
        )
    allq = np.concatenate(part_q)
    allc = np.concatenate(part_c)
    alls = np.concatenate(part_s)
    if len(keys_list) > 1:  # a record found via several keys ranks once
        nc = cb_cols[key_field].n
        packed = allq * np.int64(max(nc, 1)) + allc
        _, first = np.unique(packed, return_index=True)
        allq, allc, alls = allq[first], allc[first], alls[first]
    return _segment_topk(allq, allc, alls, nq, k)


def dedup_records_blocked(
    fields: Sequence,
    measures: Union[str, Sequence[str]] = "jaro_winkler",
    weights: Optional[Sequence[float]] = None,
    threshold: float = 0.9,
    *,
    key_field: int = 0,
    key: Union[str, Callable, Sequence] = DEFAULT_BLOCKING_KEYS,
    missing: str = "renormalize",
    config: Optional[StrsimConfig] = None,
    pair_chunk: int = 2_000_000,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
    shard: Optional[int] = None,
    num_shards: int = 1,
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Record-level blocked dedup: block on ONE field's key (default: the
    3-key union DEFAULT_BLOCKING_KEYS — see dedup_blocked), score every
    surviving unordered record pair with the weighted multi-field ensemble
    (exact f64, same null-field semantics as models/linkage.ensemble_scores),
    return (i, j, scores) with scores >= threshold, i > j, sorted by score
    descending. The production composition: union-block on surname, score
    (given, surname, town, ...) with per-field measures/weights."""
    F = len(fields)
    if F == 0:
        raise ValueError("need at least one field")
    if not (0 <= key_field < F):
        raise ValueError(f"key_field {key_field} out of range for {F} fields")
    if missing not in ("renormalize", "zero"):
        raise ValueError(f"missing must be 'renormalize' or 'zero', got {missing!r}")
    from strsim_tpu.models.linkage import _normalize_fields

    cols = [_maybe_pre(c, preprocess) for c in _obj_cols(fields)]
    n = cols[0].shape[0]
    if any(c.shape[0] != n for c in cols):
        raise ValueError("all fields must have the same length")
    measures_t, weights_t = _normalize_fields(measures, weights, F)
    cfg = config or get_config()
    # encode every field ONCE per pad side; chunks gather tiles
    qa_cols = [enc.encode_column(c, pad=enc.PAD_A) for c in cols]
    cb_cols = [enc.encode_column(c, pad=enc.PAD_B) for c in cols]
    keys_list = list(key) if isinstance(key, (tuple, list)) else [key]
    multi = len(keys_list) > 1
    # multi-key + sharding: key-group sharded enumeration with first-key
    # pair ownership when no block can be dropped; pair-hash fallback with
    # duplicated enumeration otherwise (see dedup_blocked for the scheme)
    no_drops = max_block_candidates is None or oversize != "skip"
    pair_shard = shard is not None and multi and not no_drops
    if shard is not None and not (0 <= shard < num_shards):
        raise ValueError(f"shard {shard} out of range for num_shards {num_shards}")
    out_i, out_j, out_s = [], [], []
    prev_keys = []
    for kspec in keys_list:
        keys = _keys_for(qa_cols[key_field], cols[key_field], kspec)
        for qi, ci in iter_blocked_pairs(
            keys,
            keys,
            ordered_only=True,
            max_block_candidates=max_block_candidates,
            oversize=oversize,
            chunk_pairs=pair_chunk,
            shard=None if pair_shard else shard,
            num_shards=1 if pair_shard else num_shards,
        ):
            if prev_keys and no_drops:
                own = _first_key_owned(prev_keys, qi, ci)
                qi, ci = qi[own], ci[own]
                if qi.size == 0:
                    continue
            if pair_shard:
                packed = (qi * np.int64(max(n, 1)) + ci).astype(np.uint64)
                mix = (packed * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
                keep = (mix % np.uint64(num_shards)).astype(np.int64) == shard
                qi, ci = qi[keep], ci[keep]
                if qi.size == 0:
                    continue
            scores = _ensemble_score_pairs(
                qa_cols, cb_cols, qi, ci, measures_t, weights_t, missing, cfg
            )
            hit = np.isfinite(scores) & (scores >= threshold)
            out_i.append(qi[hit])
            out_j.append(ci[hit])
            out_s.append(scores[hit])
        if multi and no_drops:
            prev_keys.append((keys, _valid_key_mask(keys)))
    if not out_i:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    qi = _concat_fast(out_i)
    ci = _concat_fast(out_j)
    scores = _concat_fast(out_s)
    if len(keys_list) > 1:  # a pair blocked by several keys is emitted once
        packed = qi * np.int64(max(n, 1)) + ci
        _, first = np.unique(packed, return_index=True)
        qi, ci, scores = qi[first], ci[first], scores[first]
    order = np.lexsort((ci, qi, -scores))
    return qi[order], ci[order], scores[order]


def dedup_blocked_stream(
    names,
    measure: str = "jaro_winkler",
    threshold: float = 0.9,
    *,
    key: Optional[Union[str, Callable]] = None,
    journal=None,
    config: Optional[StrsimConfig] = None,
    pair_chunk: int = 2_000_000,
    max_block_candidates: Optional[int] = None,
    oversize: str = "keep",
    shard: Optional[int] = None,
    num_shards: int = 1,
    preprocess=None,
):
    """Restartable streaming form of dedup_blocked for corpora whose blocked
    pair count runs to 10⁸+: yields (chunk_id, i, j, scores) per pair chunk.

    `key` stays SINGLE-KEY here (default "soundex", unlike the batch APIs'
    DEFAULT_BLOCKING_KEYS union): a multi-key union needs cross-chunk pair
    dedup, which contradicts the chunk-at-a-time journal contract. For union
    recall with restartability, run one stream per key (distinct journals —
    chunk ids are key-deterministic) and drop duplicate (i, j) when merging,
    or use num_shards workers of batch dedup_blocked (pair-hash sharded)
    — only pairs clearing the threshold, i > j, exact f64 — so a caller can
    persist incrementally. With a parallel.restart.RunJournal, chunks whose
    id is recorded are skipped on resume (mark them done AFTER durably
    storing, like models/stream.run_stream_restartable). Chunk ids are
    deterministic for identical (names, key, chunking, shard) parameters —
    the journal-validity precondition.

    The union of this generator's output over all chunks equals
    dedup_blocked's rows (dedup_blocked additionally globally sorts)."""
    if key is None:
        # 0.4.0 moved the BATCH APIs' default to the 3-key union; the stream
        # keeps single-key "soundex" (union needs cross-chunk dedup, which
        # the journal contract forbids) — so batch vs stream recall now
        # differs ~2x BY DEFAULT. Warn callers relying on the implicit
        # default once per release cycle (ADVICE r4): pass key= to silence.
        warnings.warn(
            "dedup_blocked_stream defaults to single-key 'soundex' blocking, "
            "while dedup_blocked defaults to the 3-key union "
            "(DEFAULT_BLOCKING_KEYS) since 0.4.0 — expect ~2x lower recall "
            "than the batch API. Pass key='soundex' explicitly (or one "
            "stream per union key; see docstring) to silence this warning.",
            FutureWarning,
            stacklevel=2,
        )
        key = "soundex"
    (measure,) = resolve_measures(measure)
    cfg = config or get_config()
    names = _maybe_pre(names, preprocess)
    a = enc.encode_column(names, pad=enc.PAD_A)
    b = enc.encode_column(names, pad=enc.PAD_B)
    keys = _keys_for(a, names, key)
    for idx, (qi, ci) in enumerate(
        iter_blocked_pairs(
            keys,
            keys,
            ordered_only=True,
            max_block_candidates=max_block_candidates,
            oversize=oversize,
            chunk_pairs=pair_chunk,
            shard=shard,
            num_shards=num_shards,
        )
    ):
        chunk_id = f"dedup{'' if shard is None else f'.s{shard}'}.{idx:06d}"
        if journal is not None and journal.is_done(chunk_id):
            continue
        scores = _score_pairs(a, b, qi, ci, measure, cfg, pair_chunk)
        hit = np.isfinite(scores) & (scores >= threshold)
        yield chunk_id, qi[hit], ci[hit], scores[hit]


def dedup_sorted_neighborhood(
    names,
    measure: str = "jaro_winkler",
    threshold: float = 0.9,
    *,
    window: int = 10,
    sort_key: Optional[Callable] = None,
    config: Optional[StrsimConfig] = None,
    pair_chunk: int = 2_000_000,
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sorted-neighborhood dedup: sort rows (lexicographically, or by
    sort_key(str) -> sortable), score each row against its `window` successors
    — exactly N·window pairs, a rectangle the device pipeline eats at full
    throughput regardless of key skew. Returns (i, j, scores) like
    dedup_blocked (i > j, score >= threshold, exact f64). Complements key
    blocking: catches near-duplicates whose blocking keys differ (e.g. a typo
    in the first letter breaks soundex, not sort order — and vice versa)."""
    (measure,) = resolve_measures(measure)
    cfg = config or get_config()
    names = _maybe_pre(names, preprocess)
    a = enc.encode_column(names, pad=enc.PAD_A)
    b = enc.encode_column(names, pad=enc.PAD_B)
    valid = np.nonzero(a.validity)[0]
    if valid.size < 2 or window < 1:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    vals = [names[i] if sort_key is None else sort_key(names[i]) for i in valid]
    order = valid[np.argsort(np.asarray(vals, dtype=object), kind="stable")]
    w = min(window, order.size - 1)
    lo_list, hi_list = [], []
    for d in range(1, w + 1):
        lo_list.append(order[:-d])
        hi_list.append(order[d:])
    xs = np.concatenate(lo_list).astype(np.int64)
    ys = np.concatenate(hi_list).astype(np.int64)
    qi = np.maximum(xs, ys)  # normalize to i > j (sort order ≠ index order)
    ci = np.minimum(xs, ys)
    # a pair can appear once per (d, duplicate-value) — dedup pairs
    uniq = np.unique(qi * np.int64(len(names)) + ci)
    qi = (uniq // len(names)).astype(np.int64)
    ci = (uniq % len(names)).astype(np.int64)
    scores = _score_pairs(a, b, qi, ci, measure, cfg, pair_chunk)
    hit = np.isfinite(scores) & (scores >= threshold)
    qi, ci, scores = qi[hit], ci[hit], scores[hit]
    order2 = np.lexsort((ci, qi, -scores))
    return qi[order2], ci[order2], scores[order2]
