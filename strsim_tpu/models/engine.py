"""StrsimEngine: a configured session for repeated scoring.

The functional API (strsim_tpu.compute*) re-reads the global config per call.
For production batch/serving use, an Engine instance pins a config, owns its
run metrics, pre-warms kernel shapes for an expected workload profile, and
exposes roofline/throughput reporting — the operational layer a deployed
string-matching service needs (the reference, being a query-engine plugin,
delegates all of this to Polars).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from strsim_tpu.config import StrsimConfig, get_config
from strsim_tpu.models.measures import resolve_measures
from strsim_tpu.models.pipeline import (
    _block_rows,
    _round_batch,
    compute_scores,
    prewarm_shapes,
)
from strsim_tpu.utils.metrics import RunMetrics


class StrsimEngine:
    def __init__(self, config: Optional[StrsimConfig] = None):
        self.config = config or get_config()
        self.metrics = RunMetrics()

    def prewarm(
        self,
        measures: Sequence[str],
        widths: Optional[Sequence[int]] = None,
        ascii_only: bool = True,
        large_batches: bool = True,
    ) -> None:
        """Start background compiles for the kernel shapes an expected
        workload will need (all shapes compile concurrently).

        With ascii_only=False the shapes carry a representative BMP max_char
        (0xFFFF) so kernel routing matches what dispatch will pick for int32
        BMP buckets (pipeline._jaro_impl_for routes on the bucket's measured
        max codepoint). A workload with astral codepoints (>= U+10000) routes
        to a different jaro variant at dispatch and compiles then."""
        measures = resolve_measures(measures)
        widths = list(widths) if widths is not None else list(self.config.buckets[:4])
        ascii_tiles = ascii_only and self.config.narrow_tiles
        dtype = np.int8 if ascii_tiles else np.int32
        max_char = None if ascii_tiles else 0xFFFF
        shapes = []
        for w in widths:
            blocks = {4096}
            if large_batches:
                big = _block_rows(w, self.config, measures)
                blocks.add(big)
                # the 32768 menu step (round 5): mid-size buckets round here
                if 32768 < big:
                    blocks.add(32768)
            for blk in blocks:
                shapes.append((w, blk, dtype, 1, max_char))
        prewarm_shapes(measures, shapes, self.config)

    def compute(self, measure: str, col_a, col_b) -> np.ndarray:
        (m,) = resolve_measures(measure)
        return self.compute_many((m,), col_a, col_b)[m]

    def compute_many(self, measures, col_a, col_b) -> Dict[str, np.ndarray]:
        res = compute_scores(
            col_a, col_b, measures, config=self.config, metrics=self.metrics
        )
        return {m: v for m, (v, _) in res.items()}

    def compute_with_validity(
        self, measures, col_a, col_b
    ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        return compute_scores(
            col_a, col_b, measures, config=self.config, metrics=self.metrics
        )

    def report(self) -> dict:
        return self.metrics.as_dict()

    def reset_metrics(self) -> None:
        self.metrics = RunMetrics()
