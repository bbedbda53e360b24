"""Test env: force CPU with 8 virtual devices (SURVEY.md §4) so sharding tests
run without TPU hardware. Must run before the first jax import."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax already (TPU tunnel boot) — latch CPU
# after the fact; backends are not initialized until first use.
import jax

jax.config.update("jax_platforms", "cpu")

import json
import pathlib

import pytest

# Tests exercise the device kernels on tiny batches; disable the production
# small-input host short-circuit so they keep doing so. The short-circuit
# itself is covered explicitly in tests/test_api.py.
from strsim_tpu.config import get_config, set_config

set_config(get_config().replace(host_short_circuit_rows=0))

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """{measure: [(a, b, expected), ...]} — 1,115 cases extracted from the
    reference test corpus (src/expressions/strsim.rs:347-1535)."""
    out = {}
    for path in GOLDEN_DIR.glob("*.json"):
        out[path.stem] = [tuple(case) for case in json.loads(path.read_text())]
    assert sum(len(v) for v in out.values()) == 1115
    return out
