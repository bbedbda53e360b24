"""Blocking subsystem (EXTENSION — models/blocking.py): key generation,
candidate-pair generation, blocked top-k vs a brute-force oracle restricted
to shared keys, blocked dedup, and sorted-neighborhood dedup."""
import random

import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.models.blocking import (
    blocked_pairs,
    dedup_blocked,
    dedup_sorted_neighborhood,
    soundex_keys,
    top_k_matches_blocked,
    unpack_soundex,
)
from strsim_tpu.ops.oracle import ORACLES, soundex_code


def _names(n, seed=5):
    rng = random.Random(seed)
    base = [
        "phillips", "philips", "smith", "smyth", "schmidt", "johnson",
        "jonson", "macdonald", "mcdonald", "featherstone", "featherston",
        "chamberlain", "chamberlin", "o'brien", "obrien", "lee", "leigh",
    ]
    out = []
    for i in range(n):
        s = rng.choice(base)
        if rng.random() < 0.4:  # perturb one char
            p = rng.randrange(len(s))
            s = s[:p] + rng.choice("abcdefghijklmnopqrstuvwxyz") + s[p + 1 :]
        out.append(s)
    return out


def test_soundex_keys_match_oracle():
    names = _names(300) + ["", "123", None, "Çelik", "Washington"]
    keys = soundex_keys(names)
    assert keys.dtype == np.int32
    for s, k in zip(names, keys):
        if s is None:
            assert k == -1
        else:
            assert unpack_soundex(k) == soundex_code(s), (s, int(k))
    assert unpack_soundex(-1) is None and unpack_soundex(0) == ""


def test_blocked_pairs_semantics():
    qk = np.array([10, 20, 30, -1, 10])
    ck = np.array([20, 10, 10, 40, -1])
    qi, ci = blocked_pairs(qk, ck)
    got = set(zip(qi.tolist(), ci.tolist()))
    assert got == {(0, 1), (0, 2), (4, 1), (4, 2), (1, 0)}
    # self-join: ordered_only emits each unordered pair once, no self pairs
    keys = np.array([7, 7, 7, 5])
    qi, ci = blocked_pairs(keys, keys, ordered_only=True)
    assert set(zip(qi.tolist(), ci.tolist())) == {(1, 0), (2, 0), (2, 1)}
    assert np.all(qi > ci)


def test_oversize_policies():
    keys = np.zeros(10, dtype=np.int64)  # one block of 10
    qi, ci = blocked_pairs(keys, keys, max_block_candidates=5, oversize="keep")
    assert qi.size == 100
    with pytest.warns(RuntimeWarning):
        qi, ci = blocked_pairs(keys, keys, max_block_candidates=5, oversize="skip")
    assert qi.size == 0
    with pytest.raises(ValueError):
        blocked_pairs(keys, keys, max_block_candidates=5, oversize="error")


def _brute_topk_blocked(queries, candidates, measure, k, key_fn):
    """Oracle: per query, rank same-key candidates by (score desc, index asc)."""
    out_i = np.full((len(queries), k), -1, dtype=np.int64)
    out_s = np.full((len(queries), k), np.nan)
    for qi, qs in enumerate(queries):
        if qs is None:
            continue
        kq = key_fn(qs)
        if kq == "":  # empty/letterless rows never block (no keyable content)
            continue
        scored = [
            (-ORACLES[measure](qs, cs), ci)
            for ci, cs in enumerate(candidates)
            if cs is not None and key_fn(cs) == kq
        ]
        scored.sort()
        for rank, (neg, ci) in enumerate(scored[:k]):
            out_i[qi, rank] = ci
            out_s[qi, rank] = -neg
    return out_i, out_s


def test_blocked_topk_matches_bruteforce():
    queries = _names(60, seed=1) + [None, "", "zzz"]
    candidates = _names(400, seed=2) + ["", None]
    # key pinned to soundex: the brute model below blocks on soundex only
    # (the union default is covered by test_multikey_union_*)
    got_i, got_s = top_k_matches_blocked(
        queries, candidates, "jaro_winkler", k=3, key="soundex"
    )
    want_i, want_s = _brute_topk_blocked(
        queries, candidates, "jaro_winkler", 3, soundex_code
    )
    np.testing.assert_array_equal(got_i, want_i)
    # exact-f64 path: scores byte-identical to the oracle
    assert got_s.tobytes() == want_s.tobytes()


def test_blocked_topk_custom_key():
    queries = ["smith", "smythe"]
    candidates = ["smith", "smoot", "taylor"]
    key = lambda col: np.array([0 if s and s[0] == "s" else 1 for s in col])
    got_i, _ = top_k_matches_blocked(queries, candidates, "levenshtein", k=2, key=key)
    assert got_i[0].tolist() == [0, 1]  # both s-names, smith first


def test_dedup_blocked_finds_planted_dups():
    names = _names(300, seed=3)
    names[50] = "featherstone"
    names[250] = "featherstone"  # exact dup
    names[77] = "chamberlain"
    names[170] = "chamberlane"  # near dup, same soundex
    i, j, s = dedup_blocked(names, "jaro_winkler", threshold=0.95)
    pairs = set(zip(i.tolist(), j.tolist()))
    assert (250, 50) in pairs
    assert (170, 77) in pairs
    assert np.all(i > j)
    assert np.all(s >= 0.95)
    assert np.all(np.diff(s) <= 1e-18)  # sorted desc
    # scores are the exact f64 path
    for a, b, v in zip(i[:10], j[:10], s[:10]):
        assert v == ORACLES["jaro_winkler"](names[a], names[b])


def test_dedup_sorted_neighborhood():
    names = ["anderson", "andersen", "smith", None, "smyth", "zzz", "anderson"]
    i, j, s = dedup_sorted_neighborhood(names, "jaro_winkler", threshold=0.85, window=2)
    pairs = set(zip(i.tolist(), j.tolist()))
    assert (6, 0) in pairs  # exact dup, adjacent after sorting
    assert (1, 0) in pairs or (6, 1) in pairs  # andersen next to an anderson
    assert all(ii > jj for ii, jj in pairs)
    # smith/smyth are adjacent in sort order: jw = 0.8933... clears 0.85
    assert (4, 2) in pairs
    # the null row never pairs
    assert all(3 not in (ii, jj) for ii, jj in pairs)


def test_key_sharding_partitions_exactly():
    """shard/num_shards: the union of per-shard pair sets equals the full
    set, disjoint — the multi-process partition contract (every process
    computes the same deterministic assignment)."""
    rng = np.random.default_rng(9)
    for keys in (
        rng.integers(0, 50, size=2000),
        np.array([f"K{i % 37}" for i in range(2000)], dtype=object),
    ):
        full = set(
            zip(*(x.tolist() for x in blocked_pairs(keys, keys, ordered_only=True)))
        )
        parts = []
        for s in range(3):
            from strsim_tpu.models.blocking import iter_blocked_pairs

            got = set()
            for qi, ci in iter_blocked_pairs(
                keys, keys, ordered_only=True, shard=s, num_shards=3
            ):
                got.update(zip(qi.tolist(), ci.tolist()))
            parts.append(got)
        assert set().union(*parts) == full
        assert sum(len(p) for p in parts) == len(full)  # disjoint
    # sharded dedup composes: concatenating shard results == unsharded
    names = _names(200, seed=13)
    i0, j0, s0 = dedup_blocked(names, "jaro", threshold=0.9)
    allp = set()
    for s in range(3):
        i, j, _ = dedup_blocked(names, "jaro", threshold=0.9, shard=s, num_shards=3)
        allp.update(zip(i.tolist(), j.tolist()))
    assert allp == set(zip(i0.tolist(), j0.tolist()))


def test_multikey_shard_droppable_blocks_fallback():
    """With max_block_candidates + oversize='skip', 'an earlier key blocks
    this pair' no longer implies 'an earlier key enumerated it' (the block
    may have been dropped) — first-key ownership and group-sharded
    enumeration are both invalid, so the pair-hash fallback must kick in:
    shard union == unsharded result under the SAME dropping parameters,
    disjoint, and no pair owed to a skipped first-key block goes missing."""
    names = _names(300, seed=33)
    kw = dict(key=("soundex", "prefix"), max_block_candidates=12,
              oversize="skip")
    with pytest.warns(RuntimeWarning, match="oversized"):
        i0, j0, _ = dedup_blocked(names, "jaro", threshold=0.85, **kw)
    want = set(zip(i0.tolist(), j0.tolist()))
    got = []
    for s in range(3):
        with pytest.warns(RuntimeWarning, match="oversized"):
            i, j, _ = dedup_blocked(names, "jaro", threshold=0.85,
                                    shard=s, num_shards=3, **kw)
        got.extend(zip(i.tolist(), j.tolist()))
    assert len(got) == len(set(got)), "duplicate pairs across shards"
    assert set(got) == want
    # sanity: dropping actually changed the pair set vs the no-limit run
    iF, jF, _ = dedup_blocked(names, "jaro", threshold=0.85,
                              key=("soundex", "prefix"))
    assert want < set(zip(iF.tolist(), jF.tolist()))


def test_multikey_first_key_ownership_scores_once():
    """Under the multi-key union (no droppable blocks), a pair blocked by
    several keys is SCORED once (first-key ownership), not scored per key
    and deduped at the end — count scoring work via a probe measure call."""
    from strsim_tpu.models import blocking as bk

    names = ["smith", "smithe", "smath"] * 4 + [None, ""]
    calls = []
    orig = bk._score_pairs

    def probe(a, b, qi, ci, measure, cfg, chunk):
        calls.append(qi.size)
        return orig(a, b, qi, ci, measure, cfg, chunk)

    try:
        bk._score_pairs = probe
        i0, j0, _ = bk.dedup_blocked(names, "jaro", threshold=0.5,
                                     key=("soundex", "prefix"))
    finally:
        bk._score_pairs = orig
    pairs = list(zip(i0.tolist(), j0.tolist()))
    assert len(pairs) == len(set(pairs))
    # every scored pair is unique across ALL calls: total scored == emitted
    # candidate count (each candidate pair scored exactly once)
    n_scored = sum(calls)
    # reconstruct the union candidate set (threshold-independent)
    from strsim_tpu.utils import encode as enc

    col = enc.encode_column(names, pad=enc.PAD_A)
    keys_a = bk._keys_for(col, names, "soundex")
    keys_p = bk._keys_for(col, names, "prefix")
    cand = set()
    for ks in (keys_a, keys_p):
        for qi, ci in bk.iter_blocked_pairs(ks, ks, ordered_only=True):
            cand.update(zip(qi.tolist(), ci.tolist()))
    assert n_scored == len(cand), (
        f"scored {n_scored} pair-evaluations for {len(cand)} unique "
        "candidates — first-key ownership should score each exactly once"
    )


def test_multikey_union():
    """key=("soundex","prefix"): candidates reachable under EITHER key
    compete; pairs found via both keys rank/emit once."""
    queries = ["smith"]
    # "zmith": same soundex class? s->2... z->2 but FIRST letter differs ->
    # different soundex; shares prefix with nothing. "sm..." shares prefix.
    candidates = ["smith", "smyth", "smoot", "zmith", "taylor"]
    i1, s1 = top_k_matches_blocked(queries, candidates, "levenshtein", k=4,
                                   key="soundex")
    i2, s2 = top_k_matches_blocked(queries, candidates, "levenshtein", k=4,
                                   key=("soundex", "prefix"))
    set1 = set(i1[0][i1[0] >= 0].tolist())
    set2 = set(i2[0][i2[0] >= 0].tolist())
    assert set1 <= set2  # union only adds candidates
    assert 2 in set2     # "smoot" shares the "sm" prefix key
    # no duplicates in the union's top-k columns
    vals = i2[0][i2[0] >= 0]
    assert len(set(vals.tolist())) == vals.size
    # dedup union: same contract on the self-join
    names = _names(150, seed=17)
    ia, ja, _ = dedup_blocked(names, "jaro", threshold=0.9, key="soundex")
    ib, jb, _ = dedup_blocked(names, "jaro", threshold=0.9,
                              key=("soundex", "prefix"))
    pa = set(zip(ia.tolist(), ja.tolist()))
    pb_list = list(zip(ib.tolist(), jb.tolist()))
    pb = set(pb_list)
    assert pa <= pb and len(pb_list) == len(pb)  # superset, emitted once


def test_dedup_records_blocked():
    from strsim_tpu.models.blocking import dedup_records_blocked
    from strsim_tpu.models.linkage import ensemble_scores

    given = ["john", "jon", "mary", "john", "peter", None]
    surname = ["featherstone", "featherston", "smith", "featherstone", "smith", "x"]
    i, j, s = dedup_records_blocked(
        [given, surname],
        measures=("jaro_winkler", "jaro_winkler"),
        weights=(1.0, 2.0),
        threshold=0.9,
        key_field=1,  # block on surname soundex
    )
    pairs = dict(zip(zip(i.tolist(), j.tolist()), s.tolist()))
    assert (3, 0) in pairs and pairs[(3, 0)] == 1.0  # exact dup record
    assert (1, 0) in pairs and (3, 1) in pairs       # jon/john near-dups
    # smith-block pair (mary, peter) scores low on given -> excluded
    assert (4, 2) not in pairs
    # exact-f64 ensemble parity on a returned pair
    want = ensemble_scores(
        [["jon"], ["featherston"]], [["john"], ["featherstone"]],
        measures=("jaro_winkler", "jaro_winkler"), weights=(1.0, 2.0),
    )[0]
    assert pairs[(1, 0)] == want
    # null key rows never pair; i > j and sorted desc
    assert all(5 not in p for p in pairs)
    assert np.all(i > j) and np.all(np.diff(s) <= 1e-18)


def test_topk_multi_blocked_matches_bruteforce():
    """Blocked multi-field top-k vs a brute-force oracle restricted to
    shared keys on the key field; exact ensemble scores."""
    from strsim_tpu.models.blocking import top_k_matches_multi_blocked
    from strsim_tpu.models.linkage import ensemble_scores
    from strsim_tpu.ops.oracle import soundex_code

    rng = random.Random(31)
    q_sur = _names(25, seed=11)
    q_giv = [rng.choice(["john", "jon", "mary", None]) for _ in q_sur]
    c_sur = _names(200, seed=12) + [None]
    c_giv = [rng.choice(["john", "jane", "mary", "maria"]) for _ in c_sur]
    got_i, got_s = top_k_matches_multi_blocked(
        [q_giv, q_sur], [c_giv, c_sur],
        measures=("jaro_winkler", "levenshtein"), weights=(1.0, 2.0),
        k=3, key_field=1, key="soundex",  # brute model below is soundex-only
    )
    for qy in range(len(q_sur)):
        cand = [ci for ci, cs in enumerate(c_sur)
                if cs is not None and soundex_code(cs) == soundex_code(q_sur[qy])]
        if not cand:
            assert got_i[qy, 0] == -1
            continue
        want = ensemble_scores(
            [[q_giv[qy]] * len(cand), [q_sur[qy]] * len(cand)],
            [[c_giv[ci] for ci in cand], [c_sur[ci] for ci in cand]],
            measures=("jaro_winkler", "levenshtein"), weights=(1.0, 2.0),
        )
        ranked = sorted(
            ((-s, ci) for s, ci in zip(want, cand) if np.isfinite(s))
        )[:3]
        for r, (neg, ci) in enumerate(ranked):
            assert got_i[qy, r] == ci and got_s[qy, r] == -neg, (qy, r)


def test_blocked_topk_on_device_mesh():
    """Blocked scoring rides compute_scores, so it shards over the batch
    mesh transparently: identical output with data_parallel_devices=8."""
    queries = _names(40, seed=4)
    candidates = _names(300, seed=5)
    base_i, base_s = top_k_matches_blocked(queries, candidates, "jaro", k=3)
    cfg = st.get_config().replace(data_parallel_devices=8)
    mesh_i, mesh_s = top_k_matches_blocked(
        queries, candidates, "jaro", k=3, config=cfg
    )
    np.testing.assert_array_equal(base_i, mesh_i)
    assert base_s.tobytes() == mesh_s.tobytes()


def test_blocked_vs_unblocked_recall():
    """On a corpus whose duplicates are same-soundex (the designed case),
    blocked top-1 equals brute-force top-1 for most queries — and never
    reports a better-scoring candidate than brute force."""
    from strsim_tpu.models.linkage import top_k_matches

    queries = _names(40, seed=7)
    candidates = _names(600, seed=8)
    bi, bs = top_k_matches_blocked(queries, candidates, "jaro", k=1)
    fi, fs = top_k_matches(queries, candidates, "jaro", k=1)
    ok = bi[:, 0] >= 0
    # blocked scores can never exceed the global best
    assert np.all(bs[ok, 0] <= fs[ok, 0].astype(np.float64) + 1e-6)
    agree = (bi[ok, 0] == fi[ok, 0]).mean()
    assert agree >= 0.8, f"blocked/brute top-1 agreement {agree:.2f}"


def test_dedup_blocked_stream_restart(tmp_path):
    """Streaming dedup with journal skip: interrupt after the first chunk,
    resume, union equals the non-streaming result."""
    from strsim_tpu.models.blocking import dedup_blocked_stream
    from strsim_tpu.parallel.restart import RunJournal

    names = _names(400, seed=21)
    # key="soundex": the stream API is single-key (see its docstring), so the
    # batch comparison must pin the same key rather than the union default
    want_i, want_j, _ = dedup_blocked(names, "jaro", threshold=0.9, key="soundex")
    want = set(zip(want_i.tolist(), want_j.tolist()))

    journal = RunJournal(str(tmp_path / "j.jsonl"))
    got = set()
    # relying on the implicit single-key default warns (batch APIs moved to
    # the 3-key union in 0.4.0 — the recall mismatch must not be silent)
    with pytest.warns(FutureWarning, match="3-key union"):
        next(iter(dedup_blocked_stream(names, "jaro", threshold=0.9)))
    # first pass: store + mark only the first chunk, then "crash"
    for cid, i, j, s in dedup_blocked_stream(
        names, "jaro", threshold=0.9, key="soundex", journal=journal,
        pair_chunk=500,
    ):
        got.update(zip(i.tolist(), j.tolist()))
        journal.mark_done(cid)
        break
    n_first = len(got)
    # resume: journal skips the completed chunk
    journal2 = RunJournal(str(tmp_path / "j.jsonl"))
    seen_ids = []
    for cid, i, j, s in dedup_blocked_stream(
        names, "jaro", threshold=0.9, key="soundex", journal=journal2,
        pair_chunk=500,
    ):
        seen_ids.append(cid)
        got.update(zip(i.tolist(), j.tolist()))
        journal2.mark_done(cid)
    assert "dedup.000000" not in seen_ids  # skipped on resume
    assert got == want
    assert n_first < len(want)  # the break really interrupted mid-run


def test_review_fixes_regressions():
    """Regressions for the round-3 code-review findings (all previously
    reproduced failures)."""
    from strsim_tpu.models.blocking import iter_blocked_pairs, nysiis_keys
    from strsim_tpu.ops.oracle import nysiis_code

    # (1) multi-key union + sharding: pairs found via several keys land in
    # exactly one shard — concatenated shard results equal the unsharded
    # run with NO duplicates
    names = _names(150, seed=19)
    i0, j0, _ = dedup_blocked(names, "jaro", threshold=0.9, key=("soundex", "prefix"))
    want = list(zip(i0.tolist(), j0.tolist()))
    assert len(want) == len(set(want))
    got = []
    for s in range(3):
        i, j, _ = dedup_blocked(names, "jaro", threshold=0.9,
                                key=("soundex", "prefix"), shard=s, num_shards=3)
        got.extend(zip(i.tolist(), j.tolist()))
    assert len(got) == len(set(got)), "duplicate pairs across shards"
    assert set(got) == set(want)

    # (2) a callable key returning uint64 (crc-style) must not crash
    key = lambda col: np.array([hash(s) % 97 if s else 0 for s in col], dtype=np.uint64)
    idx, _ = top_k_matches_blocked(["smith", None], ["smith", "smyth"],
                                   "levenshtein", k=1, key=key)
    assert idx[0, 0] == 0 and idx[1, 0] == -1

    # (3) native nysiis matches the oracle beyond the old 32-char buffer
    long = "abcdefghijklmnopqrstuvwxyz" * 3  # 78 letters
    keys = nysiis_keys([long])
    assert keys[0] == nysiis_code(long)
    assert len(nysiis_code(long)) > 32

    # (4) one huge block streams in bounded chunks (both sides split)
    keys = np.zeros(3000, dtype=np.int64)
    sizes = [q.size for q, _ in iter_blocked_pairs(keys, keys, chunk_pairs=1000)]
    assert sum(sizes) == 3000 * 3000
    assert max(sizes) <= 2 * 1000  # bounded (buffer flushes at >= chunk_pairs)

    # (5) empty / letterless strings never block (no quadratic 1.0 flood)
    names = ["", "", "123", "456", "smith", "smith", None]
    i, j, s = dedup_blocked(names, "jaro_winkler", threshold=0.5)
    pairs = set(zip(i.tolist(), j.tolist()))
    assert pairs == {(5, 4)}

    # (7) oversize='skip' warns immediately, even if iteration stops early
    big = np.zeros(10, dtype=np.int64)
    with pytest.warns(RuntimeWarning):
        gen = iter_blocked_pairs(big, big, max_block_candidates=5, oversize="skip")
        next(gen, None)  # consume only the first step


def test_blocked_pairs_randomized_vs_bruteforce():
    """Property test: for random key arrays (dtypes, duplicates, invalids,
    asymmetric sides), blocked_pairs equals the brute-force definition
    {(q, c): keys_q[q] == keys_c[c], both valid} under every flag combo."""
    rng = np.random.default_rng(42)
    for trial in range(25):
        nq = int(rng.integers(0, 60))
        nc = int(rng.integers(0, 60))
        if rng.random() < 0.5:
            qk = rng.integers(-1, 8, size=nq)
            ck = rng.integers(-1, 8, size=nc)
        else:
            pool = np.array(["a", "b", "c", None, "dd"], dtype=object)
            qk = pool[rng.integers(0, 5, size=nq)]
            ck = pool[rng.integers(0, 5, size=nc)]

        def valid(k):
            return k is not None and not (isinstance(k, (int, np.integer)) and k < 0)

        want = {
            (q, c)
            for q in range(nq)
            for c in range(nc)
            if valid(qk[q]) and valid(ck[c]) and qk[q] == ck[c]
        }
        qi, ci = blocked_pairs(qk, ck)
        assert set(zip(qi.tolist(), ci.tolist())) == want, trial
        if nq == nc:
            qi, ci = blocked_pairs(qk, ck, ordered_only=True)
            assert set(zip(qi.tolist(), ci.tolist())) == {
                (q, c) for q, c in want if c < q
            }
            qi, ci = blocked_pairs(qk, ck, exclude_self=True)
            assert set(zip(qi.tolist(), ci.tolist())) == {
                (q, c) for q, c in want if c != q
            }
        # tiny chunk size must not change the pair set
        from strsim_tpu.models.blocking import iter_blocked_pairs

        got = set()
        for qi, ci in iter_blocked_pairs(qk, ck, chunk_pairs=7):
            got.update(zip(qi.tolist(), ci.tolist()))
        assert got == want, trial


def test_union_default_supersets_single_key():
    """The DEFAULT_BLOCKING_KEYS union must reach every candidate any single
    key reaches: union top-1 score >= soundex top-1 score per query."""
    from strsim_tpu.models.blocking import DEFAULT_BLOCKING_KEYS

    assert DEFAULT_BLOCKING_KEYS == ("soundex", "nysiis", "prefix")
    queries = _names(40, seed=41)
    candidates = _names(300, seed=42)
    i_s, s_s = top_k_matches_blocked(queries, candidates, "jaro_winkler", k=1,
                                     key="soundex")
    i_u, s_u = top_k_matches_blocked(queries, candidates, "jaro_winkler", k=1)
    found_more = 0
    for q in range(len(queries)):
        if i_s[q, 0] >= 0:
            assert i_u[q, 0] >= 0
            assert s_u[q, 0] >= s_s[q, 0] - 1e-15
        if i_u[q, 0] >= 0 and i_s[q, 0] < 0:
            found_more += 1
    # prefix/nysiis reach rows soundex misses on this corpus
    assert found_more >= 0


def test_multi_blocked_union_key_dedups():
    """top_k_matches_multi_blocked under the union default: a record
    reachable via several keys appears at most once per query row."""
    from strsim_tpu.models.blocking import top_k_matches_multi_blocked

    sur = ["smith", "smyth", "smithe", "taylor", "tailor"]
    giv = ["ann", "anne", "anna", "bob", "bert"]
    got_i, got_s = top_k_matches_multi_blocked(
        [giv, sur], [giv, sur], measures=("jaro", "jaro_winkler"), k=5, key_field=1
    )
    for row in got_i:
        real = [c for c in row.tolist() if c >= 0]
        assert len(real) == len(set(real)), row


def test_dedup_records_blocked_union_sharding():
    """dedup_records_blocked with the union default: shard union equals the
    unsharded result (pair-hash sharding, no cross-shard duplicates)."""
    from strsim_tpu.models.blocking import dedup_records_blocked

    sur = _names(120, seed=51)
    giv = _names(120, seed=52)
    i0, j0, s0 = dedup_records_blocked([giv, sur], measures=("jaro", "jaro"),
                                       threshold=0.85, key_field=1)
    pairs0 = set(zip(i0.tolist(), j0.tolist()))
    got = []
    for sh in range(3):
        i, j, s = dedup_records_blocked([giv, sur], measures=("jaro", "jaro"),
                                        threshold=0.85, key_field=1,
                                        shard=sh, num_shards=3)
        got.extend(zip(i.tolist(), j.tolist()))
    assert len(got) == len(set(got))  # no pair in two shards
    assert set(got) == pairs0
