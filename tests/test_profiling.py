import glob

from strsim_tpu.utils.profiling import annotate, device_trace


def test_device_trace_writes_events(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        with annotate("strsim-test-span"):
            (jnp.ones((64, 64)) * 2).sum().block_until_ready()
    assert glob.glob(str(tmp_path / "plugins" / "profile" / "*")), "no trace written"
