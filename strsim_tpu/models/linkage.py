"""Record-linkage helpers: top-k candidate matching, single- and multi-field.

For every query string, find the k best-scoring candidate strings under a
similarity measure — the inner loop of deduplication / entity-resolution
pipelines (the reference's primary use case, scored row-by-row there; here the
Q×C cross product is generated and scored on device, with a device-side
lax.scan carrying the running top-k across candidate blocks so each
query-block costs ONE dispatch and only [Q, k] results leave the chip).

`top_k_matches_multi` extends this to full RECORDS: several string fields per
record (given name, surname, town, ...), each scored with its own measure and
weight, combined into one ensemble score on device — the standard shape of a
genealogy / entity-resolution blocking pass. Null fields follow the
`missing` policy ("renormalize": reweight over the fields present on both
sides; "zero": absent fields contribute 0 against the full weight sum).

Scores are the device-resident f32 path (ops/finalize_device) — ranking is
insensitive to the ≤1-ulp-of-f32 difference from the exact host scores; use
`compute`/`ensemble_scores` on the matched pairs afterwards if exact f64
values are needed.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.config import StrsimConfig, get_config
from strsim_tpu.utils import encode as enc


import functools
import warnings


def _pad_topk(idx: np.ndarray, scores: np.ndarray, k: int):
    """Pad [Q, k_eff] top-k outputs to the requested [Q, k]: the extra
    columns (k > number of candidates) are -1 / NaN, so callers can always
    index column k-1."""
    k_eff = idx.shape[1]
    if k_eff >= k:
        return idx, scores
    q = idx.shape[0]
    pad_i = np.full((q, k - k_eff), -1, dtype=idx.dtype)
    pad_s = np.full((q, k - k_eff), np.nan, dtype=scores.dtype)
    return np.concatenate([idx, pad_i], axis=1), np.concatenate([scores, pad_s], axis=1)


def _impls_for_width(
    cfg: StrsimConfig, width: int, dtype=None, max_char=None
) -> Tuple[Tuple[str, str], ...]:
    """Width/dtype-based production kernel selection, same policy as the
    batch pipeline (Pallas VMEM-resident scans on TPU at supported widths —
    incl. the fused jaro kernel with a dtype/max_char-matched compaction slot
    width — the measured-fastest XLA variant otherwise)."""
    from strsim_tpu.models.pipeline import _impls_for

    return _impls_for(cfg, width, dtype, max_char)


def _tile_dtype(q: enc.EncodedColumn, c: enc.EncodedColumn):
    """(dtype, max_char) for staging: int8 when BOTH sides are native-proven
    ASCII (4x less device staging and the byte-packed fused jaro kernel),
    int32 otherwise with the columns' max codepoint retained so the fused
    jaro kernel can pick its compaction slot width (pipeline._jaro_impl_for)."""
    if q.codes.dtype == np.int8 and c.codes.dtype == np.int8:
        return np.int8, None
    mx = max(int(q.codes.max(initial=0)), int(c.codes.max(initial=0)))
    return np.int32, mx


def _linkage_shardings(n_dev: int):
    """(query-sharded 2D, query-sharded 1D, replicated) NamedShardings over
    the batch mesh. The linkage cross product shards on the QUERY axis —
    each device scores its own query rows against the (replicated) candidate
    blocks and keeps its own running top-k, so the partition needs ZERO
    collectives (the per-device [qb/n, k] results are just gathered to host).
    Candidate-axis sharding would need a cross-device top-k merge instead."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from strsim_tpu.config import get_config
    from strsim_tpu.models.pipeline import _data_mesh

    cfg = get_config()
    mesh = _data_mesh(n_dev, cfg)
    ax = cfg.batch_axis
    return (
        NamedSharding(mesh, P(ax, None)),
        NamedSharding(mesh, P(ax)),
        NamedSharding(mesh, P()),
    )


@functools.lru_cache(maxsize=64)
def _scan_scorer(measure: str, k: int, impls: Tuple[Tuple[str, str], ...] = (),
                 n_dev: int = 1):
    from strsim_tpu.ops.finalize_device import scores_on_device

    def score_all(q_codes, q_len, c_blocks, c_len_blocks, c_valid_blocks, c_offsets):
        """q_codes [qb, W]; c_blocks [NB, cb, W]; returns ([qb, k] scores,
        [qb, k] global candidate indices). Running top-k carried on device."""
        qb = q_codes.shape[0]
        cb = c_blocks.shape[1]
        kk = min(k, cb)

        def step(carry, xs):
            best_v, best_i = carry
            cc, cl, cv, off = xs
            a = jnp.repeat(q_codes, cb, axis=0)
            la = jnp.repeat(q_len, cb)
            b = jnp.tile(cc, (qb, 1))
            lb = jnp.tile(cl, qb)
            s = scores_on_device(a, b, la, lb, (measure,), impls)[measure].reshape(qb, cb)
            s = jnp.where(cv[None, :], s, -jnp.inf)  # null/pad candidates
            vals, idx = lax.top_k(s, kk)
            merged_v = jnp.concatenate([best_v, vals], axis=1)
            merged_i = jnp.concatenate([best_i, idx.astype(jnp.int32) + off], axis=1)
            best_v, sel = lax.top_k(merged_v, kk)
            best_i = jnp.take_along_axis(merged_i, sel, axis=1)
            return (best_v, best_i), None

        init = (
            jnp.full((qb, kk), -jnp.inf, jnp.float32),
            jnp.full((qb, kk), -1, jnp.int32),
        )
        (best_v, best_i), _ = lax.scan(
            step, init, (c_blocks, c_len_blocks, c_valid_blocks, c_offsets)
        )
        return best_v, best_i

    if n_dev > 1:
        q2, q1, rep = _linkage_shardings(n_dev)
        return jax.jit(score_all, in_shardings=(q2, q1, rep, rep, rep, rep))
    return jax.jit(score_all)


def top_k_matches(
    queries,
    candidates,
    measure: str = "jaro_winkler",
    k: int = 5,
    config: Optional[StrsimConfig] = None,
    query_block: int = 128,
    candidate_block: int = 2048,
    data_parallel_devices: Optional[int] = None,
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (indices [Q, k] int64, scores [Q, k] f32): for each query, the
    indices of the k best-matching candidates (descending score) and their
    scores. Null queries get index -1 / score NaN; null candidates never
    match. When fewer than k candidates exist, trailing columns are -1 / NaN
    (the output is always k wide).

    data_parallel_devices (default: config.data_parallel_devices): shard each
    query block across an N-device batch mesh — queries partition, candidate
    blocks replicate, each device carries its own running top-k (zero
    collectives; see _linkage_shardings)."""
    cfg = config or get_config()
    n_dev = data_parallel_devices or cfg.data_parallel_devices or 1
    if preprocess is not None:
        from strsim_tpu.utils.preprocess import preprocess_column

        queries = preprocess_column(queries, preprocess)
        candidates = preprocess_column(candidates, preprocess)
    q = enc.encode_column(queries, pad=enc.PAD_A)
    c = enc.encode_column(candidates, pad=enc.PAD_B)
    width = max(q.width, c.width)
    q = enc._repad(q, enc.PAD_A, width)
    c = enc._repad(c, enc.PAD_B, width)
    Q, C = q.n, c.n
    if Q == 0 or C == 0 or k <= 0:
        kk = max(k, 0)
        return (
            np.full((Q, kk), -1, dtype=np.int64),
            np.full((Q, kk), np.nan, dtype=np.float32),
        )
    k_eff = min(k, C)
    # the scan carries [qb, min(k, cb)] — cb must cover k or the merged
    # top-k would be narrower than the requested output
    cb = min(max(candidate_block, k_eff), max(C, 1))
    qb = min(query_block, max(Q, 1))
    if n_dev > 1:  # each device must own whole query rows
        qb = -(-qb // n_dev) * n_dev

    # stage candidate blocks on device ONCE (shared across query blocks)
    dtype, max_char = _tile_dtype(q, c)
    nb = max(1, -(-C // cb))
    c_codes = np.full((nb, cb, width), enc.PAD_B, dtype=dtype)
    c_lens = np.zeros((nb, cb), dtype=np.int32)
    c_valid = np.zeros((nb, cb), dtype=bool)
    for bidx in range(nb):
        c0, c1 = bidx * cb, min((bidx + 1) * cb, C)
        n = c1 - c0
        c_codes[bidx, :n] = c.codes[c0:c1]
        c_lens[bidx, :n] = np.where(c.validity[c0:c1], c.lengths[c0:c1], 0)
        c_valid[bidx, :n] = c.validity[c0:c1]
    c_offsets = (np.arange(nb, dtype=np.int32) * cb)
    dev_c = jnp.asarray(c_codes)
    dev_cl = jnp.asarray(c_lens)
    dev_cv = jnp.asarray(c_valid)
    dev_off = jnp.asarray(c_offsets)

    scorer = _scan_scorer(
        measure, k_eff, _impls_for_width(cfg, width, dtype, max_char), n_dev
    )
    best_scores = np.full((Q, k_eff), -np.inf, dtype=np.float32)
    best_idx = np.full((Q, k_eff), -1, dtype=np.int64)

    for q0 in range(0, Q, qb):
        q1 = min(q0 + qb, Q)
        nq = q1 - q0
        qc = np.full((qb, width), enc.PAD_A, dtype=dtype)
        qc[:nq] = q.codes[q0:q1]
        ql = np.zeros(qb, dtype=np.int32)
        ql[:nq] = np.where(q.validity[q0:q1], q.lengths[q0:q1], 0)
        args = (jnp.asarray(qc), jnp.asarray(ql), dev_c, dev_cl, dev_cv, dev_off)
        try:
            vals, idx = scorer(*args)
        except Exception as e:
            # production-kernel (Pallas) compile failure: degrade to the XLA
            # kernels, matching the batch pipeline's guarded-compile policy.
            # Surface the degradation — a runtime bug repeating on the XLA
            # path still raises there, so nothing real is swallowed.
            warnings.warn(
                f"top_k_matches: production kernel failed ({type(e).__name__}: "
                f"{e}); recomputing block on XLA kernels",
                RuntimeWarning,
            )
            scorer = _scan_scorer(measure, k_eff, (), n_dev)
            vals, idx = scorer(*args)
        best_scores[q0:q1] = np.asarray(vals)[:nq]
        best_idx[q0:q1] = np.asarray(idx)[:nq].astype(np.int64)

    out_scores = best_scores
    invalid_q = ~q.validity
    out_scores[invalid_q] = np.nan
    best_idx[invalid_q] = -1
    no_match = ~np.isfinite(out_scores)
    best_idx[no_match] = -1
    out_scores[no_match & ~invalid_q[:, None]] = np.nan
    return _pad_topk(best_idx, out_scores, k)


# --------------------------------------------------------------------------
# Multi-field (record-level) ensemble matching
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _scan_scorer_multi(measures: Tuple[str, ...], weights: Tuple[float, ...],
                       k: int, missing: str, exclude: bool = False,
                       impls: Tuple[Tuple[Tuple[str, str], ...], ...] = (),
                       n_dev: int = 1):
    from strsim_tpu.ops.finalize_device import scores_on_device

    F = len(measures)
    field_impls = impls if impls else ((),) * F
    w_total = np.float32(sum(weights))

    def score_all(q_codes, q_len, q_valid, c_blocks, c_len_blocks,
                  c_valid_blocks, c_offsets, q_excl=None):
        """Per-field tuples: q_codes[f] [qb, Wf]; c_blocks[f] [NB, cb, Wf].
        Returns ([qb, k] ensemble scores, [qb, k] global candidate indices);
        the running top-k is carried on device across candidate blocks.
        q_excl [qb] (exclude=True only): global candidate index each query
        must never match (self-match suppression for dedup self-joins)."""
        qb = q_codes[0].shape[0]
        cb = c_blocks[0].shape[1]
        kk = min(k, cb)

        def step(carry, xs):
            best_v, best_i = carry
            ccs, cls, cvs, off = xs
            num = jnp.zeros((qb, cb), jnp.float32)
            den = jnp.zeros((qb, cb), jnp.float32)
            any_valid = jnp.zeros((qb, cb), bool)
            for f in range(F):
                a = jnp.repeat(q_codes[f], cb, axis=0)
                la = jnp.repeat(q_len[f], cb)
                b = jnp.tile(ccs[f], (qb, 1))
                lb = jnp.tile(cls[f], qb)
                s = scores_on_device(a, b, la, lb, (measures[f],),
                                     field_impls[f])[
                    measures[f]
                ].reshape(qb, cb)
                valid = q_valid[f][:, None] & cvs[f][None, :]
                w = np.float32(weights[f])
                num = num + jnp.where(valid, s * w, 0.0)
                den = den + jnp.where(valid, w, 0.0)
                any_valid = any_valid | valid
            if missing == "zero":
                # absent fields count as 0 similarity against the full
                # weight mass (a record missing a field is penalized)
                den = jnp.where(any_valid, w_total, 0.0)
            s = jnp.where(any_valid & (den > 0), num / den, -jnp.inf)
            if exclude:
                gidx = off + jnp.arange(cb, dtype=jnp.int32)
                s = jnp.where(gidx[None, :] == q_excl[:, None], -jnp.inf, s)
            vals, idx = lax.top_k(s, kk)
            merged_v = jnp.concatenate([best_v, vals], axis=1)
            merged_i = jnp.concatenate([best_i, idx.astype(jnp.int32) + off], axis=1)
            best_v, sel = lax.top_k(merged_v, kk)
            best_i = jnp.take_along_axis(merged_i, sel, axis=1)
            return (best_v, best_i), None

        init = (
            jnp.full((qb, kk), -jnp.inf, jnp.float32),
            jnp.full((qb, kk), -1, jnp.int32),
        )
        (best_v, best_i), _ = lax.scan(
            step, init, (c_blocks, c_len_blocks, c_valid_blocks, c_offsets)
        )
        return best_v, best_i

    if n_dev > 1:
        q2, q1, rep = _linkage_shardings(n_dev)
        shardings = [(q2,) * F, (q1,) * F, (q1,) * F,
                     (rep,) * F, (rep,) * F, (rep,) * F, rep]
        if exclude:
            shardings.append(q1)
        return jax.jit(score_all, in_shardings=tuple(shardings))
    return jax.jit(score_all)


def _normalize_fields(measures, weights, n_fields: int):
    from strsim_tpu.models.measures import MEASURES

    if isinstance(measures, str):
        measures = (measures,) * n_fields
    measures = tuple(measures)
    if len(measures) != n_fields:
        raise ValueError(
            f"{n_fields} field pairs but {len(measures)} measures"
        )
    for m in measures:
        if m not in MEASURES:
            raise ValueError(f"unknown measure {m!r}")
    if weights is None:
        weights = (1.0,) * n_fields
    weights = tuple(float(w) for w in weights)
    if len(weights) != n_fields:
        raise ValueError(f"{n_fields} field pairs but {len(weights)} weights")
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    return measures, weights


def top_k_matches_multi(
    query_fields: Sequence,
    candidate_fields: Sequence,
    measures: Union[str, Sequence[str]] = "jaro_winkler",
    weights: Optional[Sequence[float]] = None,
    k: int = 5,
    missing: str = "renormalize",
    config: Optional[StrsimConfig] = None,
    query_block: int = 128,
    candidate_block: int = 2048,
    exclude_index: Optional[Sequence[int]] = None,
    data_parallel_devices: Optional[int] = None,
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Record-level top-k matching over several string fields.

    query_fields / candidate_fields: sequences of F string columns (one per
    field — e.g. [given_names, surnames]); all query columns share length Q,
    all candidate columns length C. Each field f is scored with measures[f]
    and weighted by weights[f]; the ensemble score of a (query, candidate)
    record pair is the weighted mean over fields where BOTH sides are
    non-null. `missing="renormalize"` reweights over present fields;
    `missing="zero"` keeps the full weight sum as the denominator, so a
    missing field drags the score down. Records with no scoreable field pair
    never match (and all-null query records return index -1 / score NaN).

    exclude_index: optional [Q] candidate index each query must never match —
    pass range(Q) (or use `dedup_top_k`) for a self-join that suppresses the
    trivial self-match.

    Returns (indices [Q, k] int64, scores [Q, k] f32), descending; when fewer
    than k candidates exist, trailing columns are -1 / NaN (always k wide).
    """
    if missing not in ("renormalize", "zero"):
        raise ValueError(f"missing must be 'renormalize' or 'zero', got {missing!r}")
    F = len(query_fields)
    if F == 0 or len(candidate_fields) != F:
        raise ValueError(
            f"need matching non-empty field lists, got {F} query / "
            f"{len(candidate_fields)} candidate fields"
        )
    measures, weights = _normalize_fields(measures, weights, F)
    cfg = config or get_config()
    n_dev = data_parallel_devices or cfg.data_parallel_devices or 1
    if preprocess is not None:
        from strsim_tpu.utils.preprocess import preprocess_column

        query_fields = [preprocess_column(c, preprocess) for c in query_fields]
        candidate_fields = [preprocess_column(c, preprocess) for c in candidate_fields]
    excl = None
    if exclude_index is not None:
        excl = np.asarray(exclude_index, dtype=np.int32)

    qs, cs = [], []
    for f in range(F):
        q = enc.encode_column(query_fields[f], pad=enc.PAD_A)
        c = enc.encode_column(candidate_fields[f], pad=enc.PAD_B)
        width = max(q.width, c.width)
        qs.append(enc._repad(q, enc.PAD_A, width))
        cs.append(enc._repad(c, enc.PAD_B, width))
    Q, C = qs[0].n, cs[0].n
    if any(q.n != Q for q in qs) or any(c.n != C for c in cs):
        raise ValueError("all field columns on a side must have equal length")
    if excl is not None and excl.shape != (Q,):
        raise ValueError(f"exclude_index must have shape ({Q},), got {excl.shape}")
    if Q == 0 or C == 0 or k <= 0:
        kk = max(k, 0)
        return (
            np.full((Q, kk), -1, dtype=np.int64),
            np.full((Q, kk), np.nan, dtype=np.float32),
        )
    k_eff = min(k, C)
    cb = min(max(candidate_block, k_eff), max(C, 1))
    qb = min(query_block, max(Q, 1))
    if n_dev > 1:  # each device must own whole query rows
        qb = -(-qb // n_dev) * n_dev
    nb = max(1, -(-C // cb))

    # stage candidate blocks on device ONCE per field (shared across queries)
    field_dtypes = [_tile_dtype(q, c) for q, c in zip(qs, cs)]  # (dtype, max_char)
    dev_c, dev_cl, dev_cv = [], [], []
    for c, (fdt, _) in zip(cs, field_dtypes):
        width = c.codes.shape[1]
        codes = np.full((nb, cb, width), enc.PAD_B, dtype=fdt)
        lens = np.zeros((nb, cb), dtype=np.int32)
        valid = np.zeros((nb, cb), dtype=bool)
        for bidx in range(nb):
            c0, c1 = bidx * cb, min((bidx + 1) * cb, C)
            n = c1 - c0
            codes[bidx, :n] = c.codes[c0:c1]
            lens[bidx, :n] = np.where(c.validity[c0:c1], c.lengths[c0:c1], 0)
            valid[bidx, :n] = c.validity[c0:c1]
        dev_c.append(jnp.asarray(codes))
        dev_cl.append(jnp.asarray(lens))
        dev_cv.append(jnp.asarray(valid))
    dev_off = jnp.asarray(np.arange(nb, dtype=np.int32) * cb)

    field_impls = tuple(
        _impls_for_width(cfg, c.codes.shape[1], fdt, fmx)
        for c, (fdt, fmx) in zip(cs, field_dtypes)
    )
    scorer = _scan_scorer_multi(measures, weights, k_eff, missing,
                                exclude=excl is not None, impls=field_impls,
                                n_dev=n_dev)
    best_scores = np.full((Q, k_eff), -np.inf, dtype=np.float32)
    best_idx = np.full((Q, k_eff), -1, dtype=np.int64)

    for q0 in range(0, Q, qb):
        q1 = min(q0 + qb, Q)
        nq = q1 - q0
        qc, ql, qv = [], [], []
        for q, (fdt, _) in zip(qs, field_dtypes):
            width = q.codes.shape[1]
            codes = np.full((qb, width), enc.PAD_A, dtype=fdt)
            codes[:nq] = q.codes[q0:q1]
            lens = np.zeros(qb, dtype=np.int32)
            lens[:nq] = np.where(q.validity[q0:q1], q.lengths[q0:q1], 0)
            valid = np.zeros(qb, dtype=bool)
            valid[:nq] = q.validity[q0:q1]
            qc.append(jnp.asarray(codes))
            ql.append(jnp.asarray(lens))
            qv.append(jnp.asarray(valid))
        args = [
            tuple(qc), tuple(ql), tuple(qv),
            tuple(dev_c), tuple(dev_cl), tuple(dev_cv), dev_off,
        ]
        if excl is not None:
            # padded query rows exclude nothing (-1 is never a real index)
            qx = np.full(qb, -1, dtype=np.int32)
            qx[:nq] = excl[q0:q1]
            args.append(jnp.asarray(qx))
        try:
            vals, idx = scorer(*args)
        except Exception as e:
            # Pallas compile failure: degrade to XLA kernels (pipeline
            # policy), and surface the degradation — a runtime bug repeating
            # on the XLA path still raises there.
            warnings.warn(
                f"top_k_matches_multi: production kernel failed "
                f"({type(e).__name__}: {e}); recomputing block on XLA kernels",
                RuntimeWarning,
            )
            scorer = _scan_scorer_multi(measures, weights, k_eff, missing,
                                        exclude=excl is not None, n_dev=n_dev)
            vals, idx = scorer(*args)
        best_scores[q0:q1] = np.asarray(vals)[:nq]
        best_idx[q0:q1] = np.asarray(idx)[:nq].astype(np.int64)

    no_match = ~np.isfinite(best_scores)
    best_idx[no_match] = -1
    best_scores[no_match] = np.nan
    return _pad_topk(best_idx, best_scores, k)


def dedup_top_k(
    fields: Sequence,
    measures: Union[str, Sequence[str]] = "jaro_winkler",
    weights: Optional[Sequence[float]] = None,
    k: int = 5,
    missing: str = "renormalize",
    config: Optional[StrsimConfig] = None,
    query_block: int = 128,
    candidate_block: int = 2048,
    data_parallel_devices: Optional[int] = None,
    preprocess=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Self-join deduplication: for every record, its k nearest OTHER records
    under the weighted ensemble (the trivial self-match is suppressed on
    device). `fields` is a sequence of F string columns, all length N; pass a
    single-element list for one-field dedup. Returns (indices [N, k] int64,
    scores [N, k] f32)."""
    n = len(fields[0]) if fields else 0
    return top_k_matches_multi(
        fields, fields, measures=measures, weights=weights, k=k,
        missing=missing, config=config, query_block=query_block,
        candidate_block=candidate_block, exclude_index=np.arange(n),
        data_parallel_devices=data_parallel_devices, preprocess=preprocess,
    )


def ensemble_scores(
    a_fields: Sequence,
    b_fields: Sequence,
    measures: Union[str, Sequence[str]] = "jaro_winkler",
    weights: Optional[Sequence[float]] = None,
    missing: str = "renormalize",
    config: Optional[StrsimConfig] = None,
    preprocess=None,
) -> np.ndarray:
    """Exact (f64, host-finalized) ensemble scores for ALIGNED record pairs —
    the rescoring companion to `top_k_matches_multi`: run the top-k pass on
    device, then rescore the matched pairs here for exact values. Null-field
    policy matches `top_k_matches_multi`; rows with no scoreable field are
    NaN.

    The argument order mirrors `top_k_matches_multi` (field lists first,
    `measures=` keyword): both companion APIs take (records_a, records_b,
    measures=..., weights=..., missing=...)."""
    if missing not in ("renormalize", "zero"):
        raise ValueError(f"missing must be 'renormalize' or 'zero', got {missing!r}")
    from strsim_tpu.api import compute_with_validity

    F = len(a_fields)
    if F == 0 or len(b_fields) != F:
        raise ValueError(
            f"need matching non-empty field lists, got {F} / {len(b_fields)}"
        )
    measures, weights = _normalize_fields(measures, weights, F)
    if preprocess is not None:
        from strsim_tpu.utils.preprocess import preprocess_column

        a_fields = [preprocess_column(c, preprocess) for c in a_fields]
        b_fields = [preprocess_column(c, preprocess) for c in b_fields]

    num = den = any_valid = None
    for f in range(F):
        vals, validity = compute_with_validity(
            measures[f], a_fields[f], b_fields[f], config=config
        )
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
