import glob

from strsim_tpu.utils.profiling import annotate, device_trace


def test_device_trace_writes_events(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        with annotate("strsim-test-span"):
            (jnp.ones((64, 64)) * 2).sum().block_until_ready()
    assert glob.glob(str(tmp_path / "plugins" / "profile" / "*")), "no trace written"


def test_pipeline_phases_appear_in_trace(tmp_path):
    """The pipeline's phase annotations (strsim.encode/classify/dispatch/
    collect_finalize) must land in a captured trace — the observability
    contract, not just 'the context managers do not throw'."""
    from strsim_tpu.models.pipeline import compute_scores

    with device_trace(str(tmp_path)):
        compute_scores(["phillips", "smith"], ["philips", "smyth"], ("jaro",))
    blobs = []
    for p in (tmp_path / "plugins" / "profile").rglob("*"):
        if p.is_file():
            blobs.append(p.read_bytes())
    joined = b"".join(blobs)
    import gzip

    for p in (tmp_path / "plugins" / "profile").rglob("*.gz"):
        try:
            joined += gzip.decompress(p.read_bytes())
        except OSError:
            pass
    for name in (b"strsim.encode", b"strsim.classify", b"strsim.dispatch",
                 b"strsim.collect_finalize"):
        assert name in joined, f"{name} span missing from trace"


def test_annotate_is_cheap_without_trace():
    """Annotations outside a trace must not add measurable overhead."""
    import time

    t0 = time.perf_counter()
    for _ in range(1000):
        with annotate("noop"):
            pass
    assert time.perf_counter() - t0 < 0.5
