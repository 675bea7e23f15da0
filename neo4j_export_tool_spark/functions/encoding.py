"""JSON value-encoding contract for export records.

Reproduces the reference serializer's type → JSON mapping
(``Export/Serialization/Engine.fs:40-62`` dispatch; per-type encoders in
``Primitives.fs`` / ``Collections.fs`` / ``Spatial.fs`` / ``Temporal.fs``):

- NaN / ±Infinity  → JSON strings "NaN", "Infinity", "-Infinity"
  (``Primitives.fs:77-91``; checked before numeric, ``Engine.fs:51-52``)
- string > 10,000,000 chars → ``{_truncated:"string_too_large", _length,
  _prefix (997 chars + "..."), _sha256 (base64)}`` (``Primitives.fs:42-59``;
  prefix via ``Export/Utils.fs:35-42``)
- bytes ≤ 50,000,000 → base64 string; larger → ``{_truncated:
  "binary_too_large", _length, _sha256}`` (``Primitives.fs:93-110``)
- list over MaxCollectionItems (10,000; ``Core/Constants.fs:196``) →
  truncated + trailing marker ``{_truncated:"list_too_large", _total_items,
  _shown_items}`` (``Collections.fs:41-63``)
- map: duplicate keys renamed ``key_1, key_2…``, keys > 1000 chars truncated
  (``Collections.fs:65-102``; ``Export/Utils.fs:53-75``); over-limit marker
  ``_truncated:"map_too_large"`` with ``_total_entries``/``_shown_entries``
- property bag over limit → ``"_truncated": "too_many_properties: N total"``
  (``Collections.fs:104-128``)
- Point → ``{type:"Point", srid, x, y[, z]}``, z omitted when NaN
  (``Spatial.fs:29-39``)
- temporals → ISO-8601-ish strings (``Temporal.fs:29-46``); Spark timestamps
  are µs-precision, vs the reference's 100 ns truncation
  (``BatchProcessing.fs:104-149``) — documented delta.
- depth > 10 → ``{_truncated:"depth_limit_exceeded", _depth, _type}``
  (``Engine.fs:41-42``, ``Context.fs:54-67``)
- unknown type → ``{_type, _note:"unserializable_type"}`` (``Context.fs:69-89``)

All of this runs inside Arrow-vectorized pandas UDFs during JSONL
serialization; none of it touches the per-row Python path of Spark proper.
"""

from __future__ import annotations

import base64
import dataclasses
import datetime as dt
import hashlib
import json
import math
from collections.abc import Mapping, Sequence
from typing import Any

# Limits: reference Core/Constants.fs:186-199
MAX_STRING_LENGTH = 10_000_000
MAX_BINARY_LENGTH = 50_000_000
MAX_COLLECTION_ITEMS = 10_000
MAX_NESTED_DEPTH = 10
MAX_KEY_LENGTH = 1_000
MAX_LABEL_LENGTH = 1_000
MAX_LABELS_PER_NODE = 100  # Core/Constants.fs:191
# nested graph elements switch serialization mode by depth (Context.fs:38-43)
NESTED_SHALLOW_MODE_DEPTH = 5  # Core/Constants.fs:187
NESTED_REFERENCE_MODE_DEPTH = 8  # Core/Constants.fs:188


@dataclasses.dataclass(frozen=True)
class Point:
    """Neo4j spatial point (SRID 4326/4979 WGS84, 7203/9157 cartesian)."""

    srid: int
    x: float
    y: float
    z: float = float("nan")


@dataclasses.dataclass(frozen=True)
class Duration:
    """Neo4j duration (months/days/seconds/nanos), ISO-8601 formatted.

    Format parity target: reference ``Temporal.fs:29-40`` serializes via
    ``.ToString()`` → e.g. "P1Y2M3DT4H5M6S".
    """

    months: int = 0
    days: int = 0
    seconds: int = 0
    nanos: int = 0

    def iso(self) -> str:
        years, months = divmod(self.months, 12)
        total_ns = self.seconds * 1_000_000_000 + self.nanos
        sign = "-" if total_ns < 0 else ""
        total_ns = abs(total_ns)
        hours, rem = divmod(total_ns, 3_600 * 1_000_000_000)
        minutes, rem = divmod(rem, 60 * 1_000_000_000)
        secs, ns = divmod(rem, 1_000_000_000)
        out = "P"
        if years:
            out += f"{years}Y"
        if months:
            out += f"{months}M"
        if self.days:
            out += f"{self.days}D"
        time_part = ""
        if hours:
            time_part += f"{sign}{hours}H"
        if minutes:
            time_part += f"{sign}{minutes}M"
        if secs or ns or not (years or months or self.days or hours or minutes):
            if ns:
                frac = f"{ns:09d}".rstrip("0")
                time_part += f"{sign}{secs}.{frac}S"
            else:
                time_part += f"{sign}{secs}S"
        if time_part:
            out += "T" + time_part
        return out


def _sha256_b64(data: bytes) -> str:
    """SHA-256 → base64 — the `_sha256` field of truncation markers
    (reference ``Export/Utils.fs:44-49``, distinct from the lowercase-hex
    content hashes)."""
    return base64.b64encode(hashlib.sha256(data).digest()).decode("ascii")


def truncate_with_ellipsis(s: str, max_len: int) -> str:
    """Span-slice to ``max_len - 3`` + "..." (reference ``Export/Utils.fs:35-42``)."""
    if len(s) <= max_len:
        return s
    return s[: max_len - 3] + "..."


def ensure_unique_keys(keys: Sequence[str]) -> list[str]:
    """Rename duplicate map keys ``key_1``, ``key_2``… and truncate over-long
    keys (reference ``Export/Utils.fs:53-75``)."""
    seen: set[str] = set()
    out: list[str] = []
    for key in keys:
        # reference ensureUniqueKey (Export/Utils.fs:53-58): keys over 1000
        # chars truncate via truncateSpan 997 → 994 chars + "..." (997 total)
        k = truncate_with_ellipsis(key, 997) if len(key) > MAX_KEY_LENGTH else key
        if k in seen:
            i = 1
            while f"{k}_{i}" in seen:
                i += 1
            k = f"{k}_{i}"
        seen.add(k)
        out.append(k)
    return out


def validate_label(label: str | None) -> str:
    """null or over-long labels → ``_invalid_label`` (reference
    ``Export/Utils.fs:78-88``)."""
    if label is None or len(label) > MAX_LABEL_LENGTH:
        return "_invalid_label"
    return label


def encode_value(value: Any, depth: int = 0) -> Any:
    """Encode one property value into its JSON-ready shape per the contract."""
    # Arrow→pandas struct decoding hands back numpy scalars/arrays; normalize
    # to Python natives so the type dispatch below stays exact
    mod = type(value).__module__
    if mod == "numpy":
        value = value.tolist() if hasattr(value, "tolist") else value.item()
    # reference SerializationDepth.exceedsLimit (Core/Types.fs:51) is
    # `d >= limit`: a value nested exactly MAX_NESTED_DEPTH deep already
    # serializes as the depth marker
    if depth >= MAX_NESTED_DEPTH:
        return {
            "_truncated": "depth_limit_exceeded",
            "_depth": depth,
            "_type": type(value).__name__,
        }
    if value is None or isinstance(value, bool):
        return value
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if math.isinf(value):
            return "Infinity" if value > 0 else "-Infinity"
        return value
    if isinstance(value, str):
        if len(value) > MAX_STRING_LENGTH:
            return {
                "_truncated": "string_too_large",
                "_length": len(value),
                "_prefix": truncate_with_ellipsis(value, 1000),
                "_sha256": _sha256_b64(value.encode("utf-8")),
            }
        return value
    if isinstance(value, (bytes, bytearray)):
        raw = bytes(value)
        if len(raw) > MAX_BINARY_LENGTH:
            return {
                "_truncated": "binary_too_large",
                "_length": len(raw),
                "_sha256": _sha256_b64(raw),
            }
        return base64.b64encode(raw).decode("ascii")
    if isinstance(value, Point):
        out: dict[str, Any] = {
            "type": "Point",
            "srid": value.srid,
            "x": value.x,
            "y": value.y,
        }
        if not math.isnan(value.z):
            out["z"] = value.z
        return out
    if isinstance(value, Duration):
        return value.iso()
    if isinstance(value, dt.datetime):
        # µs-precision ISO; zone offset appended when tz-aware ("O"-format
        # analog, reference Temporal.fs:42-46). Spark is µs, reference 100ns.
        return value.isoformat()
    if isinstance(value, dt.date):
        return value.isoformat()
    if isinstance(value, dt.time):
        return value.isoformat()
    if isinstance(value, Mapping):
        keys = list(value.keys())[:MAX_COLLECTION_ITEMS]
        safe = ensure_unique_keys([str(k) if k is not None else "null" for k in keys])
        out = {
            sk: encode_value(value[k], depth + 1)
            for sk, k in zip(safe, keys)
        }
        if len(value) > MAX_COLLECTION_ITEMS:
            out["_truncated"] = "map_too_large"
            out["_total_entries"] = len(value)
            out["_shown_entries"] = MAX_COLLECTION_ITEMS
        return out
    if isinstance(value, Sequence):
        items = [encode_value(v, depth + 1) for v in value[:MAX_COLLECTION_ITEMS]]
        if len(value) > MAX_COLLECTION_ITEMS:
            items.append(
                {
                    "_truncated": "list_too_large",
                    "_total_items": len(value),
                    "_shown_items": MAX_COLLECTION_ITEMS,
                }
            )
        return items
    return {"_type": type(value).__name__, "_note": "unserializable_type"}


def encode_properties(props: Mapping[str, Any] | None) -> dict[str, Any]:
    """Property-bag encoding with the too-many-properties cap
    (reference ``Collections.fs:104-128``)."""
    if not props:
        return {}
    keys = list(props.keys())[:MAX_COLLECTION_ITEMS]
    safe = ensure_unique_keys([str(k) for k in keys])
    out = {sk: encode_value(props[k]) for sk, k in zip(safe, keys)}
    if len(props) > MAX_COLLECTION_ITEMS:
        out["_truncated"] = f"too_many_properties: {len(props)} total"
    return out


def dumps(obj: Any) -> str:
    """Compact JSON, no HTML escaping (reference ``Json/JsonConfig.fs:33-48``
    uses UnsafeRelaxedJsonEscaping; Python's non-ASCII-escaping dumps matches)."""
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
