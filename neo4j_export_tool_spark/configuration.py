"""Engine configuration: env-var parsing with ERROR ACCUMULATION.

The P7 analog (reference ``Configuration/Configuration.fs:160-237`` +
``Configuration/FieldValidators.fs``): every field is validated and ALL
problems are reported together, instead of dying on the first — the
operator-experience feature that matters when a spark-submit carries a dozen
``--conf``s.  Env prefix ``SPARK_KG_`` (reference used ``N4JET_``).
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Validated pipeline configuration."""

    batch_size: int = 10_000            # Arrow records per batch (1..100_000)
    max_collection_items: int = 10_000  # list/map truncation limit
    minhash_k: int = 64                 # signature length (bands*rows)
    minhash_bands: int = 32
    dedup_threshold_pct: int = 60       # 1..100
    cc_max_iterations: int = 20         # >= 1
    shuffle_partitions: int | None = None
    enable_hashed_ids: bool = True
    output_dir: str = "./out"


class ConfigError(ValueError):
    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


_ENV_PREFIX = "SPARK_KG_"


def _parse_int(raw: str, name: str, lo: int, hi: int, errors: list[str]) -> int | None:
    try:
        v = int(raw)
    except ValueError:
        errors.append(f"{name}: not an integer: {raw!r}")
        return None
    if not (lo <= v <= hi):
        errors.append(f"{name}: {v} outside [{lo}, {hi}]")
        return None
    return v


def _parse_bool(raw: str, name: str, errors: list[str]) -> bool | None:
    low = raw.strip().lower()
    if low in ("1", "true", "yes", "on"):
        return True
    if low in ("0", "false", "no", "off"):
        return False
    errors.append(f"{name}: not a boolean: {raw!r}")
    return None


def load_config(env: dict[str, str] | None = None) -> EngineConfig:
    """Parse ``SPARK_KG_*`` variables; raise ``ConfigError`` carrying EVERY
    invalid field at once (reference-style accumulation)."""
    env = dict(os.environ) if env is None else env
    errors: list[str] = []
    fields: dict[str, object] = {}

    specs_int = {
        "batch_size": ("BATCH_SIZE", 1, 100_000),
        "max_collection_items": ("MAX_COLLECTION_ITEMS", 1, 1_000_000),
        "minhash_k": ("MINHASH_K", 4, 512),
        "minhash_bands": ("MINHASH_BANDS", 1, 256),
        "dedup_threshold_pct": ("DEDUP_THRESHOLD_PCT", 1, 100),
        "cc_max_iterations": ("CC_MAX_ITERATIONS", 1, 1_000),
        "shuffle_partitions": ("SHUFFLE_PARTITIONS", 1, 100_000),
    }
    for field, (suffix, lo, hi) in specs_int.items():
        raw = env.get(_ENV_PREFIX + suffix)
        if raw is not None:
            v = _parse_int(raw, _ENV_PREFIX + suffix, lo, hi, errors)
            if v is not None:
                fields[field] = v

    raw = env.get(_ENV_PREFIX + "ENABLE_HASHED_IDS")
    if raw is not None:
        v = _parse_bool(raw, _ENV_PREFIX + "ENABLE_HASHED_IDS", errors)
        if v is not None:
            fields["enable_hashed_ids"] = v

    raw = env.get(_ENV_PREFIX + "OUTPUT_DIR")
    if raw is not None:
        if not raw.strip():
            errors.append(f"{_ENV_PREFIX}OUTPUT_DIR: empty")
        else:
            fields["output_dir"] = raw

    # cross-field invariant: bands must divide k
    k = fields.get("minhash_k", EngineConfig.minhash_k)
    b = fields.get("minhash_bands", EngineConfig.minhash_bands)
    if isinstance(k, int) and isinstance(b, int) and k % b != 0:
        errors.append(
            f"{_ENV_PREFIX}MINHASH_BANDS: {b} does not divide MINHASH_K={k}"
        )

    if errors:
        raise ConfigError(errors)
    return EngineConfig(**fields)  # type: ignore[arg-type]
