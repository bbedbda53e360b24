"""Record-linkage helper: top-k candidate matching.

For every query string, find the k best-scoring candidate strings under a
similarity measure — the inner loop of deduplication / entity-resolution
pipelines (the reference's primary use case, scored row-by-row there; here the
Q×C cross product is generated and scored on device in blocks, with only the
per-block top-k leaving the chip).

Scores are the device-resident f32 path (ops/finalize_device) — ranking is
insensitive to the ≤1-ulp-of-f32 difference from the exact host scores; use
compute_scores on the matched pairs afterwards if exact f64 values are needed.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.config import StrsimConfig, get_config
from strsim_tpu.utils import encode as enc


def _block_scorer(measure: str, qb: int, cb: int, width: int, k: int):
    from strsim_tpu.ops.finalize_device import scores_on_device

    @jax.jit
    def score_block(q_codes, q_len, c_codes, c_len):
        # cross product [qb*cb] pairs; pads differ per side so no masking
        a = jnp.repeat(q_codes, cb, axis=0)                     # [qb*cb, W]
        la = jnp.repeat(q_len, cb)
        b = jnp.tile(c_codes, (qb, 1))                          # [qb*cb, W]
        lb = jnp.tile(c_len, qb)
        s = scores_on_device(a, b, la, lb, (measure,))[measure]  # [qb*cb]
        s = s.reshape(qb, cb)
        # invalid candidates (zero-length pad rows vs nonempty query) score 0
        vals, idx = lax.top_k(s, min(k, cb))
        return vals, idx

    return score_block


def top_k_matches(
    queries,
    candidates,
    measure: str = "jaro_winkler",
    k: int = 5,
    config: Optional[StrsimConfig] = None,
    query_block: int = 128,
    candidate_block: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (indices [Q, k] int64, scores [Q, k] f32): for each query, the
    indices of the k best-matching candidates (descending score) and their
    scores. Null queries get index -1 / score NaN; null candidates never
    match."""
    cfg = config or get_config()
    q = enc.encode_column(queries, pad=enc.PAD_A)
    c = enc.encode_column(candidates, pad=enc.PAD_B)
    width = max(q.width, c.width)
    q = enc._repad(q, enc.PAD_A, width)
    c = enc._repad(c, enc.PAD_B, width)
    Q, C = q.n, c.n
    k_eff = min(k, C)

    qb = min(query_block, max(Q, 1))
    cb = min(candidate_block, max(C, 1))
    scorer = _block_scorer(measure, qb, cb, width, k_eff)

    # invalid candidates must never win: zero length scores 0 against any
    # nonempty query, but an EMPTY query would score 1.0 vs null-pad rows —
    # push null candidates' scores down by masking after fetch instead.
    cand_valid = c.validity

    best_scores = np.full((Q, k_eff), -np.inf, dtype=np.float32)
    best_idx = np.zeros((Q, k_eff), dtype=np.int64)

    for q0 in range(0, Q, qb):
        q1 = min(q0 + qb, Q)
        q_codes = enc._repad(q.slice(q0, q1), enc.PAD_A, width)
        nq = q1 - q0
        qc = np.full((qb, width), enc.PAD_A, dtype=np.int32)
        qc[:nq] = q_codes.codes
        ql = np.zeros(qb, dtype=np.int32)
        ql[:nq] = np.where(q_codes.validity, q_codes.lengths, 0)

        for c0 in range(0, C, cb):
            c1 = min(c0 + cb, C)
            nc = c1 - c0
            cc = np.full((cb, width), enc.PAD_B, dtype=np.int32)
            cc[:nc] = c.codes[c0:c1]
            cl = np.zeros(cb, dtype=np.int32)
            cl[:nc] = np.where(c.validity[c0:c1], c.lengths[c0:c1], 0)

            vals, idx = scorer(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(cc), jnp.asarray(cl))
            vals = np.asarray(vals)[:nq]
            idx = np.asarray(idx)[:nq].astype(np.int64) + c0

            # mask out pad rows and null candidates
            local_valid = np.zeros(C + cb, dtype=bool)
            local_valid[:C] = cand_valid
            ok = (idx < C) & local_valid[np.minimum(idx, C + cb - 1)]
            vals = np.where(ok, vals, -np.inf)

            merged_scores = np.concatenate([best_scores[q0:q1], vals], axis=1)
            merged_idx = np.concatenate([best_idx[q0:q1], idx], axis=1)
            order = np.argsort(-merged_scores, axis=1, kind="stable")[:, :k_eff]
            best_scores[q0:q1] = np.take_along_axis(merged_scores, order, axis=1)
            best_idx[q0:q1] = np.take_along_axis(merged_idx, order, axis=1)

    # null queries: no matches
    out_scores = best_scores.astype(np.float32)
    invalid_q = ~q.validity
    out_scores[invalid_q] = np.nan
    best_idx[invalid_q] = -1
    # queries with no valid candidate at some slots keep -inf -> normalize to NaN/-1
    no_match = ~np.isfinite(out_scores)
    best_idx[no_match & (best_idx >= 0)] = -1
    out_scores[no_match] = np.nan
    return best_idx, out_scores
