from strsim_tpu.models.measures import MEASURES, MEASURE_NAMES, Measure
from strsim_tpu.models.pipeline import compute_scores

__all__ = ["MEASURES", "MEASURE_NAMES", "Measure", "compute_scores"]
