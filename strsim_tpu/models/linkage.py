"""Record-linkage helper: top-k candidate matching.

For every query string, find the k best-scoring candidate strings under a
similarity measure — the inner loop of deduplication / entity-resolution
pipelines (the reference's primary use case, scored row-by-row there; here the
Q×C cross product is generated and scored on device, with a device-side
lax.scan carrying the running top-k across candidate blocks so each
query-block costs ONE dispatch and only [Q, k] results leave the chip).

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


import functools


@functools.lru_cache(maxsize=64)
def _scan_scorer(measure: str, k: int):
    from strsim_tpu.ops.finalize_device import scores_on_device

    @jax.jit
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
            s = scores_on_device(a, b, la, lb, (measure,))[measure].reshape(qb, cb)
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

    return score_all


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
    if Q == 0 or C == 0 or k <= 0:
        kk = max(min(k, C), 0)
        return (
            np.full((Q, kk), -1, dtype=np.int64),
            np.full((Q, kk), np.nan, dtype=np.float32),
        )
    cb = min(candidate_block, max(C, 1))
    k_eff = min(k, C)
    qb = min(query_block, max(Q, 1))

    # stage candidate blocks on device ONCE (shared across query blocks)
    nb = max(1, -(-C // cb))
    c_codes = np.full((nb, cb, width), enc.PAD_B, dtype=np.int32)
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

    scorer = _scan_scorer(measure, k_eff)
    best_scores = np.full((Q, k_eff), -np.inf, dtype=np.float32)
    best_idx = np.full((Q, k_eff), -1, dtype=np.int64)

    for q0 in range(0, Q, qb):
        q1 = min(q0 + qb, Q)
        nq = q1 - q0
        qc = np.full((qb, width), enc.PAD_A, dtype=np.int32)
        qc[:nq] = q.codes[q0:q1]
        ql = np.zeros(qb, dtype=np.int32)
        ql[:nq] = np.where(q.validity[q0:q1], q.lengths[q0:q1], 0)
        vals, idx = scorer(jnp.asarray(qc), jnp.asarray(ql), dev_c, dev_cl, dev_cv, dev_off)
        best_scores[q0:q1] = np.asarray(vals)[:nq]
        best_idx[q0:q1] = np.asarray(idx)[:nq].astype(np.int64)

    out_scores = best_scores
    invalid_q = ~q.validity
    out_scores[invalid_q] = np.nan
    best_idx[invalid_q] = -1
    no_match = ~np.isfinite(out_scores)
    best_idx[no_match] = -1
    out_scores[no_match & ~invalid_q[:, None]] = np.nan
    return best_idx, out_scores
