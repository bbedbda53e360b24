"""Config semantics: bucket resolution, overflow policies."""
import strsim_tpu as st


def test_bucket_for_ladder():
    cfg = st.get_config()
    assert cfg.bucket_for(1) == 7
    assert cfg.bucket_for(7) == 7
    assert cfg.bucket_for(8) == 15
    assert cfg.bucket_for(511) == 511


def test_bucket_overflow_extend():
    cfg = st.get_config()
    w = cfg.bucket_for(600)
    assert w >= 600 and cfg.overflow_policy == "extend"
    assert cfg.bucket_for(cfg.max_extend_len + 1) == -1  # oracle fallback


def test_bucket_overflow_oracle_policy():
    cfg = st.get_config().replace(overflow_policy="oracle")
    assert cfg.bucket_for(600) == -1


def test_replace_is_functional():
    cfg = st.get_config()
    cfg2 = cfg.replace(min_batch=16)
    assert cfg.min_batch != 16 or cfg2.min_batch == 16
    assert cfg2.min_batch == 16
