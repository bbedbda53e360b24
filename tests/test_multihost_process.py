"""REAL multi-process jax.distributed coverage (2 CPU processes over
loopback): init_distributed + run_host_shard + allgather_scores, verified
bit-exact against the single-process reference. This is the measured
counterpart to the in-process simulated-host tests in test_parallel.py."""
import os
import sys

def test_two_process_allgather_bit_exact():
    # (the spawned workers have their own 600 s communicate() timeout)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import bench_multihost

    os.environ["STRSIM_MH_ROWS"] = "2000"
    try:
        result = bench_multihost.part_b(num_processes=2)
    finally:
        os.environ.pop("STRSIM_MH_ROWS", None)
    assert result["ok"], result.get("errors")
    assert len(result["workers"]) == 2
    for w in result["workers"]:
        assert w["allgather_matches_reference"], w
        assert w["bit_exact"], w
    total_local = sum(w["local_rows"] for w in result["workers"])
    assert total_local == 2000  # disjoint + exhaustive partition
