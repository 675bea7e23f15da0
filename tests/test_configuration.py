"""Config validation with error accumulation (P7 analog; port of the
reference's ConfigurationTests/FieldValidatorsTests patterns)."""

from __future__ import annotations

import pytest

from neo4j_export_tool_spark.configuration import (
    ConfigError,
    EngineConfig,
    load_config,
)


def test_defaults():
    cfg = load_config(env={})
    assert cfg == EngineConfig()


def test_valid_overrides():
    cfg = load_config(
        env={
            "SPARK_KG_BATCH_SIZE": "500",
            "SPARK_KG_MINHASH_K": "128",
            "SPARK_KG_MINHASH_BANDS": "64",
            "SPARK_KG_ENABLE_HASHED_IDS": "false",
            "SPARK_KG_OUTPUT_DIR": "/tmp/x",
        }
    )
    assert cfg.batch_size == 500
    assert cfg.minhash_k == 128
    assert cfg.enable_hashed_ids is False
    assert cfg.output_dir == "/tmp/x"


def test_all_errors_accumulated():
    with pytest.raises(ConfigError) as exc:
        load_config(
            env={
                "SPARK_KG_BATCH_SIZE": "zero",        # not an int
                "SPARK_KG_MINHASH_K": "100000",       # out of range
                "SPARK_KG_ENABLE_HASHED_IDS": "maybe",  # not a bool
                "SPARK_KG_OUTPUT_DIR": "  ",          # empty
            }
        )
    errors = exc.value.errors
    assert len(errors) == 4
    assert any("BATCH_SIZE" in e for e in errors)
    assert any("MINHASH_K" in e for e in errors)
    assert any("ENABLE_HASHED_IDS" in e for e in errors)
    assert any("OUTPUT_DIR" in e for e in errors)


def test_cross_field_invariant():
    with pytest.raises(ConfigError, match="does not divide"):
        load_config(env={"SPARK_KG_MINHASH_K": "64", "SPARK_KG_MINHASH_BANDS": "48"})


def test_range_bounds():
    with pytest.raises(ConfigError):
        load_config(env={"SPARK_KG_BATCH_SIZE": "0"})
    assert load_config(env={"SPARK_KG_BATCH_SIZE": "1"}).batch_size == 1
    assert load_config(env={"SPARK_KG_BATCH_SIZE": "100000"}).batch_size == 100000
