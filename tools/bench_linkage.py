#!/usr/bin/env python
"""Record-linkage (top-k matching) benchmark → BENCH_LINKAGE.json.

The reference's primary production use case is entity resolution /
deduplication: for every query name, find the best-scoring candidates
(reference demo + README pair columns are genealogy near-duplicates). The
reference scores pairs row-by-row through Polars; `models/linkage.py`
generates and scores the Q×C cross product ON DEVICE with a lax.scan carrying
the running top-k across candidate blocks — one dispatch per query block,
only [Q, k] results leave the chip.

Methodology (same relay-immunity argument as utils/devicetime.py): the
scorer is ONE executable whose scan length is the number of staged candidate
blocks. wall(NB) = dispatch + NB * t_block + fetch([Q, k]); timing the same
query block against NB1 and NB2 candidate blocks and differencing cancels
every fixed relay/dispatch/fetch cost, leaving the marginal on-device time
per candidate block. candidate-pairs/s = qb * cb * (NB2 - NB1) / Δwall.

Correctness: a small Q×C slice is checked against the pure-Python oracle —
every returned (index, score) must match the oracle score of that exact pair
to f32 tolerance, and the returned score vector must equal the oracle's
top-k score vector (tie-order insensitive).

Run: timeout 1800 python tools/bench_linkage.py   (one TPU process at a
time; first run compiles one scorer per measure — persistent cache applies).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root harness: make_pairs, _log)

K = 10
QB = 128  # queries per dispatch (top_k_matches default)
CB = 2048  # candidates per staged block
NB1, NB2 = 4, 36  # scan lengths differenced for marginal block time
REPS = 3
MEASURES = ("jaro_winkler", "levenshtein", "jaccard")


def _stage_candidates(cand, width, dtype=np.int32):
    """Pad candidates into [NB, CB, width] blocks (as top_k_matches — int8
    for ASCII columns, the production staging dtype)."""
    from strsim_tpu.utils import encode as enc

    c = enc.encode_column(cand, pad=enc.PAD_B, width=width)
    C = c.n
    nb = -(-C // CB)
    codes = np.full((nb, CB, width), enc.PAD_B, dtype=dtype)
    lens = np.zeros((nb, CB), dtype=np.int32)
    valid = np.zeros((nb, CB), dtype=bool)
    for i in range(nb):
        c0, c1 = i * CB, min((i + 1) * CB, C)
        n = c1 - c0
        codes[i, :n] = c.codes[c0:c1]
        lens[i, :n] = np.where(c.validity[c0:c1], c.lengths[c0:c1], 0)
        valid[i, :n] = c.validity[c0:c1]
    return codes, lens, valid


def resident_rate(measure, q_codes, q_len, codes, lens, valid, impls=()):
    """Marginal candidate-pairs/s via scan-length differencing.

    Candidate blocks are uploaded ONCE ([nb0, CB, W] through the relay);
    longer scans reuse them by tiling ON DEVICE (an HBM copy, no relay
    traffic). The scan length doubles until the marginal wall difference is
    large against relay jitter (same adaptation as devicetime.marginal_...).
    `impls`: production kernel selection (as top_k_matches passes it).
    """
    import jax.numpy as jnp

    from strsim_tpu.models.linkage import _scan_scorer

    scorer = _scan_scorer(measure, K, impls)
    dq, dql = jnp.asarray(q_codes), jnp.asarray(q_len)
    dc, dcl, dcv = jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(valid)
    nb0 = codes.shape[0]

    def run(nb):
        reps = -(-nb // nb0)
        cc = jnp.tile(dc, (reps, 1, 1))[:nb]  # device-side tiling
        cl = jnp.tile(dcl, (reps, 1))[:nb]
        cv = jnp.tile(dcv, (reps, 1))[:nb]
        off = jnp.arange(nb, dtype=jnp.int32) * CB

        def wall():
            t0 = time.perf_counter()
            v, i = scorer(dq, dql, cc, cl, cv, off)
            np.asarray(v), np.asarray(i)  # fetch forces remote completion
            return time.perf_counter() - t0

        wall()  # compile/warm
        return min(wall() for _ in range(REPS))

    w1 = run(NB1)
    nb2 = NB2
    while True:
        w2 = run(nb2)
        if w2 - w1 > 0.12 or nb2 >= 1024:
            break
        nb2 *= 2
    dt = max(w2 - w1, 1e-9)
    rate = QB * CB * (nb2 - NB1) / dt
    return rate, {
        "wall_nb1_s": round(w1, 4),
        "wall_nb2_s": round(w2, 4),
        "nb1": NB1,
        "nb2": nb2,
    }


def resident_rate_multi(measures, weights, q_fields, c_fields, field_impls=()):
    """Marginal candidate-RECORD-pairs/s for the multi-field ensemble scorer
    (same scan-length differencing as resident_rate; each record pair scores
    len(measures) per-field measures plus the weighted combine on device)."""
    import jax.numpy as jnp

    from strsim_tpu.models.linkage import _scan_scorer_multi

    scorer = _scan_scorer_multi(tuple(measures), tuple(weights), K, "renormalize",
                                impls=field_impls)
    dq = tuple(jnp.asarray(q) for q, _, _ in q_fields)
    dql = tuple(jnp.asarray(l) for _, l, _ in q_fields)
    dqv = tuple(jnp.asarray(v) for _, _, v in q_fields)
    dc = tuple(jnp.asarray(c) for c, _, _ in c_fields)
    dcl = tuple(jnp.asarray(l) for _, l, _ in c_fields)
    dcv = tuple(jnp.asarray(v) for _, _, v in c_fields)
    nb0 = c_fields[0][0].shape[0]

    def run(nb):
        reps = -(-nb // nb0)
        cc = tuple(jnp.tile(c, (reps, 1, 1))[:nb] for c in dc)
        cl = tuple(jnp.tile(l, (reps, 1))[:nb] for l in dcl)
        cv = tuple(jnp.tile(v, (reps, 1))[:nb] for v in dcv)
        off = jnp.arange(nb, dtype=jnp.int32) * CB

        def wall():
            t0 = time.perf_counter()
            v, i = scorer(dq, dql, dqv, cc, cl, cv, off)
            np.asarray(v), np.asarray(i)
            return time.perf_counter() - t0

        wall()
        return min(wall() for _ in range(REPS))

    w1 = run(NB1)
    nb2 = NB2
    while True:
        w2 = run(nb2)
        if w2 - w1 > 0.12 or nb2 >= 1024:
            break
        nb2 *= 2
    dt = max(w2 - w1, 1e-9)
    rate = QB * CB * (nb2 - NB1) / dt
    return rate, {
        "wall_nb1_s": round(w1, 4),
        "wall_nb2_s": round(w2, 4),
        "nb1": NB1,
        "nb2": nb2,
    }


def correctness_check_multi(measures, weights, q_fields, c_fields):
    """top_k_matches_multi vs a brute-force f64 oracle combine."""
    from strsim_tpu.models.linkage import top_k_matches_multi
    from strsim_tpu.models.measures import MEASURES as REG

    idx, scores = top_k_matches_multi(
        q_fields, c_fields, measures=measures, weights=weights, k=5
    )
    Q, C = len(q_fields[0]), len(c_fields[0])
    full = np.full((Q, C), -np.inf)
    for r in range(Q):
        for c in range(C):
            num = den = 0.0
            for f, m in enumerate(measures):
                qv, cv = q_fields[f][r], c_fields[f][c]
                if qv is None or cv is None:
                    continue
                num += weights[f] * REG[m].oracle(qv, cv)
                den += weights[f]
            if den > 0:
                full[r, c] = num / den
    for r in range(Q):
        want = np.sort(full[r])[::-1][:5]
        got = scores[r].astype(np.float64)
        if np.all(~np.isfinite(want)):
            if not (np.all(idx[r] == -1) and np.all(np.isnan(got))):
                return False, {"row": r, "got": got.tolist()}
            continue
        # compare only the finite prefix: `got` pads no-match columns with
        # NaN while `want` pads with -inf, and allclose on mixed pads would
        # report a false failure for rows with < 5 finite candidate scores
        w_fin = np.isfinite(want)
        g_fin = np.isfinite(got)
        if not np.array_equal(w_fin, g_fin):
            return False, {"row": r, "got": got.tolist(), "want": want.tolist()}
        if not np.allclose(got[g_fin], want[w_fin], atol=2e-6):
            return False, {"row": r, "got": got.tolist(), "want": want.tolist()}
        for c_i, s in zip(idx[r], scores[r]):
            if c_i >= 0 and abs(full[r, c_i] - float(s)) > 2e-6:
                return False, {"row": r, "idx": int(c_i), "score": float(s)}
    return True, {}


def correctness_check(measure, queries, cand):
    """top_k_matches vs the pure-Python oracle on a small Q×C slice."""
    from strsim_tpu.models.linkage import top_k_matches
    from strsim_tpu.models.measures import MEASURES

    oracle = MEASURES[measure].oracle
    idx, scores = top_k_matches(queries, cand, measure=measure, k=5)
    full = np.array(
        [
            [
                (oracle(q, c) if (q is not None and c is not None) else -np.inf)
                for c in cand
            ]
            for q in queries
        ]
    )
    for r, q in enumerate(queries):
        if q is None:
            assert np.all(idx[r] == -1) and np.all(np.isnan(scores[r])), r
            continue
        want = np.sort(full[r])[::-1][:5]
        got = scores[r].astype(np.float64)
        if not np.allclose(got, want, atol=2e-6):
            return False, {"row": r, "got": got.tolist(), "want": want.tolist()}
        for c_i, s in zip(idx[r], scores[r]):
            if c_i < 0:
                continue
            if abs(oracle(q, cand[c_i]) - float(s)) > 2e-6:
                return False, {"row": r, "idx": int(c_i), "score": float(s)}
    return True, {}


def main() -> None:
    from strsim_tpu.utils import encode as enc

    col_a, col_b = bench.make_pairs(200_000, seed=11)
    cand = col_a[:NB2 * CB]  # 73,728 distinct-ish candidate names
    queries = col_b[:QB]  # near-duplicate queries (same generator)
    bench._log(f"linkage bench: {QB} queries x {NB2 * CB:,} candidates, k={K}")

    qe = enc.encode_column(queries, pad=enc.PAD_A)
    ce_probe = enc.encode_column(cand, pad=enc.PAD_B)
    width = max(qe.width, ce_probe.width)
    qe = enc._repad(qe, enc.PAD_A, width)
    # production staging dtype: int8 when both sides are native-proven ASCII
    # (models/linkage._tile_dtype) — unlocks the fused Pallas jaro kernel
    dtype = (
        np.int8
        if qe.codes.dtype == np.int8 and ce_probe.codes.dtype == np.int8
        else np.int32
    )
    from strsim_tpu.config import get_config
    from strsim_tpu.models.linkage import _impls_for_width

    impls = _impls_for_width(get_config(), width, dtype)
    q_codes = qe.codes.astype(dtype)
    q_len = np.where(qe.validity, qe.lengths, 0).astype(np.int32)
    codes, lens, valid = _stage_candidates(cand, width, dtype)

    out = {
        "_meta": {
            "workload": (
                f"{QB} query names x {NB2 * CB} candidate names (bench.make_pairs "
                f"generator, width {width}), k={K}, f32 device scoring path"
            ),
            "resident_candidate_pairs_per_sec": (
                "marginal on-device cross-product scoring rate: one scorer "
                "executable, scan-length (candidate-block count) differenced — "
                "relay dispatch/fetch costs cancel (see module docstring)"
            ),
            "vs_single_core": (
                "resident rate / BENCH_DETAILS.json baseline_single_core_pairs_"
                "per_sec for the same measure (a scalar top-k loop scores every "
                "cross-product pair once, so per-pair rates compare directly)"
            ),
        },
        "measures": {},
    }
    try:
        details = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAILS.json")))
    except Exception:
        details = {"measures": {}}

    for m in MEASURES:
        rate, walls = resident_rate(m, q_codes, q_len, codes, lens, valid, impls)
        base = details["measures"].get(m, {}).get("baseline_single_core_pairs_per_sec")
        out["measures"][m] = {
            "resident_candidate_pairs_per_sec": round(rate),
            "vs_single_core": round(rate / base, 1) if base else None,
            **walls,
        }
        bench._log(f"linkage[{m}]: resident {rate:,.0f} cand-pairs/s")

    # multi-field ensemble: 2 fields (given-name-like / surname-like columns
    # from independent generator seeds), jaro_winkler + levenshtein, 1:2
    ens_measures, ens_weights = ("jaro_winkler", "levenshtein"), (1.0, 2.0)
    f2_a, f2_b = bench.make_pairs(200_000, seed=12)
    cand2, queries2 = f2_a[: NB2 * CB], f2_b[:QB]
    qe2 = enc.encode_column(queries2, pad=enc.PAD_A)
    ce2_probe = enc.encode_column(cand2, pad=enc.PAD_B)
    width2 = max(qe2.width, ce2_probe.width)
    qe2 = enc._repad(qe2, enc.PAD_A, width2)
    dtype2 = (
        np.int8
        if qe2.codes.dtype == np.int8 and ce2_probe.codes.dtype == np.int8
        else np.int32
    )
    impls2 = _impls_for_width(get_config(), width2, dtype2)
    q_fields = [
        (q_codes, q_len, qe.validity.copy()),
        (
            qe2.codes.astype(dtype2),
            np.where(qe2.validity, qe2.lengths, 0).astype(np.int32),
            qe2.validity.copy(),
        ),
    ]
    c_fields = [
        (codes, lens, valid),
        _stage_candidates(cand2, width2, dtype2),
    ]
    rate, walls = resident_rate_multi(ens_measures, ens_weights, q_fields,
                                      c_fields, (impls, impls2))
    base = [
        details["measures"].get(m, {}).get("baseline_single_core_pairs_per_sec")
        for m in ens_measures
    ]
    # a scalar ensemble loop scores one pair per field per record pair:
    # its record-pairs/s is 1 / sum_f (1 / per-measure pairs/s)
    base_rec = 1.0 / sum(1.0 / b for b in base) if all(base) else None
    out["ensemble_2field"] = {
        "measures": list(ens_measures),
        "weights": list(ens_weights),
        "resident_candidate_record_pairs_per_sec": round(rate),
        "vs_single_core": round(rate / base_rec, 1) if base_rec else None,
        **walls,
    }
    bench._log(f"linkage[ensemble 2-field]: resident {rate:,.0f} record-pairs/s")
    ok_m, info_m = correctness_check_multi(
        ens_measures,
        ens_weights,
        [list(queries[:24]), list(queries2[:24])],
        [list(cand[:800]), list(cand2[:800])],
    )
    out["ensemble_2field"]["oracle_check"] = {"ok": bool(ok_m), **info_m}
    bench._log(f"linkage ensemble oracle check: {'ok' if ok_m else info_m}")

    # end-to-end wall (tunnel-bound in this env, recorded for completeness)
    from strsim_tpu.models.linkage import top_k_matches

    t0 = time.perf_counter()
    top_k_matches(queries, cand, measure="jaro_winkler", k=K)
    out["e2e_wall_s_jaro_winkler"] = round(time.perf_counter() - t0, 3)

    ok, info = correctness_check("jaro_winkler", list(queries[:40]), list(cand[:1500]))
    out["oracle_check"] = {"ok": bool(ok), **info}
    bench._log(f"linkage oracle check: {'ok' if ok else info}")

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_LINKAGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["measures"]))
    if not ok or not ok_m:
        sys.exit(1)


if __name__ == "__main__":
    main()
