"""Multi-device tests on the 8-way virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strsim_tpu.parallel import mesh as pmesh
from strsim_tpu.parallel import partition as part
from strsim_tpu.ops import oracle
from strsim_tpu.utils import encode as enc


def _tiles(col_a, col_b, width):
    a = enc.encode_column(col_a, pad=enc.PAD_A, width=width)
    b = enc.encode_column(col_b, pad=enc.PAD_B, width=width)
    return (
        jnp.asarray(a.codes),
        jnp.asarray(b.codes),
        jnp.asarray(a.lengths),
        jnp.asarray(b.lengths),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_stats_match_oracle():
    words = ["phillips", "philips", "smith", "smyth", "johnson", "jonson", "x", "yz"]
    col_a = [words[i % len(words)] for i in range(64)]
    col_b = [words[(i * 3 + 1) % len(words)] for i in range(64)]
    mesh = pmesh.make_mesh(jax.devices())
    step = pmesh.sharded_stats_fn(("levenshtein", "jaccard"), mesh)
    args = pmesh.device_put_sharded_batch(_tiles(col_a, col_b, 8), mesh)
    out = step(*args)
    want_d = np.array([oracle.levenshtein_distance(a, b) for a, b in zip(col_a, col_b)])
    want_i = np.array([oracle.multiset_intersection(a, b) for a, b in zip(col_a, col_b)])
    np.testing.assert_array_equal(np.asarray(out["lev_d"]), want_d)
    np.testing.assert_array_equal(np.asarray(out["inter"]), want_i)


def test_sharded_output_is_batch_sharded():
    mesh = pmesh.make_mesh(jax.devices())
    step = pmesh.sharded_stats_fn(("jaccard",), mesh)
    col = ["abc"] * 32
    args = pmesh.device_put_sharded_batch(_tiles(col, col, 8), mesh)
    out = step(*args)
    shards = out["inter"].addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (4,) for s in shards)


def test_split_offsets_matches_reference_shape():
    # strsim.rs:21-39: equal chunks, last absorbs remainder
    assert part.split_offsets(10, 3) == [(0, 3), (3, 3), (6, 4)]
    assert part.split_offsets(5, 1) == [(0, 5)]
    assert part.split_offsets(0, 4) == [(0, 0)]


def test_cost_balanced_partition_beats_equal_split_on_skew():
    rng = np.random.default_rng(3)
    # 10% of rows are 16x longer — the skew scenario from the north star
    la = np.where(rng.random(4000) < 0.1, 480, 30).astype(np.int64)
    lb = la.copy()
    costs = part.row_cost(la, lb, ["levenshtein"], buckets=(8, 16, 32, 64, 128, 256, 512))
    k = 8
    balanced = part.cost_balanced_partition(costs, k)
    # every row assigned exactly once
    all_idx = np.sort(np.concatenate(balanced))
    np.testing.assert_array_equal(all_idx, np.arange(4000))
    eff_balanced = part.balance_report(costs, balanced)["scaling_efficiency_model"]
    equal = [np.arange(off, off + ln) for off, ln in part.split_offsets(4000, k)]
    eff_equal = part.balance_report(costs, equal)["scaling_efficiency_model"]
    assert eff_balanced >= 0.8
    assert eff_balanced >= eff_equal


def test_row_cost_monotone_in_length():
    la = np.array([4, 40, 400])
    c = part.row_cost(la, la, ["levenshtein", "jaro"], buckets=(8, 16, 32, 64, 128, 256, 512))
    assert c[0] < c[1] < c[2]


def test_multihost_simulation_matches_single_run():
    """Simulate 4 hosts in-process: per-host shards must reassemble to exactly
    the single-host result (deterministic partition + order-preserving merge)."""
    from strsim_tpu.parallel import multihost as mh
    from strsim_tpu.models.pipeline import compute_scores

    rng = np.random.default_rng(11)
    words = ["phillips", "philips", "smith", "", "featherstone", "x" * 300]
    col_a = [words[i % len(words)] if i % 17 else None for i in range(500)]
    col_b = [words[(i * 5 + 2) % len(words)] for i in range(500)]
    measures = ("levenshtein", "jaro_winkler")

    single = compute_scores(col_a, col_b, measures)
    shards = [
        mh.run_host_shard(col_a, col_b, measures, host_id=h, n_hosts=4)
        for h in range(4)
    ]
    merged = mh.merge_host_results(500, shards)
    for m in measures:
        np.testing.assert_array_equal(merged[m][1], single[m][1])
        assert merged[m][0].tobytes() == single[m][0].tobytes()


def test_metrics_collection():
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.utils.metrics import RunMetrics

    metrics = RunMetrics()
    col_a = ["phillips", "phillips", "", None, "washington-irving"]
    col_b = ["phillips", "philips", "x", "y", "washington irving jr"]
    compute_scores(col_a, col_b, ("levenshtein",), metrics=metrics)
    assert metrics.n_rows == 5
    assert metrics.null_rows == 1
    assert metrics.fast_path_rows == 1    # equal pair
    assert metrics.one_empty_rows == 1
    assert metrics.device_rows == 2
    assert metrics.total_wall_s > 0
    d = metrics.as_dict()
    assert len(d["buckets"]) == 2  # one small, one mid bucket
    for b in d["buckets"].values():
        assert 0.0 <= b["padding_waste"] < 1.0


def test_roofline_report_shape():
    from strsim_tpu.ops.roofline import roofline_report

    r = roofline_report("levenshtein", batch=65536, width=8, measured_s=0.004)
    assert r["bound"] in ("compute", "memory")
    assert r["speed_of_light_s"] > 0 and 0 < r["efficiency"]
    assert r["sol_pairs_per_sec"] > r["pairs_per_sec"] * r["efficiency"] * 0.99


def test_pipeline_data_parallel_devices():
    """compute_scores with data_parallel_devices=8 on the virtual CPU mesh:
    bit-identical results, kernels actually sharded over the batch."""
    import strsim_tpu as st
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.ops.oracle import ORACLES

    words = ["phillips", "philips", "smith", "smyth", "washington", "wash"]
    col_a = [words[i % 6] for i in range(300)]
    col_b = [words[(i * 7 + 3) % 6] for i in range(300)]
    cfg = st.get_config().replace(data_parallel_devices=8, equal_fast_path=False)
    got = compute_scores(col_a, col_b, ("levenshtein", "jaro_winkler"), config=cfg)
    for m in ("levenshtein", "jaro_winkler"):
        want = np.array([ORACLES[m](a, b) for a, b in zip(col_a, col_b)])
        assert got[m][0].tobytes() == want.tobytes(), m
