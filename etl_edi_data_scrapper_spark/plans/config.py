"""Job-config ("query") validation.

Reference semantics: `src/Service/Config/InputConfig.php:5-95` and
`src/Service/Config/SubSource.php:5-81`. The JSON job message is the
reference's entire query language; this module is its analyzer.

Divergence by design (SURVEY.md §2.8.4): multi-source detection keys on
``type_id is None`` + source being a list — the reference treats ANY
JSON-decodable string source as multi-source, a known bug.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

VALID_TYPE_IDS = frozenset(range(1, 9))


class InvalidConfigError(ValueError):
    pass


@dataclass(frozen=True)
class SubSource:
    """One leg of a multi-source job (`SubSource.php:26-58`).

    ``key`` is the join column of THIS leg (matched against the base leg's
    key values); ``fields`` are the only columns copied onto the base.
    """

    type_id: int
    filename: str
    key: str
    fields: tuple[str, ...]
    range: str | None = None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "SubSource":
        for req in ("type_id", "filename", "key", "fields"):
            if req not in d or d[req] in (None, "", []):
                raise InvalidConfigError(f"sub-source missing required field {req!r}: {d}")
        if d["type_id"] not in VALID_TYPE_IDS:
            raise InvalidConfigError(f"sub-source type_id must be 1..8, got {d['type_id']!r}")
        if not isinstance(d["fields"], (list, tuple)):
            raise InvalidConfigError("sub-source 'fields' must be a list")
        return SubSource(
            type_id=int(d["type_id"]),
            filename=str(d["filename"]),
            key=str(d["key"]),
            fields=tuple(str(f) for f in d["fields"]),
            range=d.get("range"),
        )


@dataclass(frozen=True)
class InputConfig:
    """Validated job spec (`InputConfig.php:17-39`).

    Required: supplier_id, source, column_map_rules, version.
    ``type_id`` in 1..8, or None → multi-source (source = list of SubSource).
    """

    supplier_id: int
    source: str | tuple[SubSource, ...]
    column_map_rules: dict[str, Any]
    version: int
    type_id: int | None = None
    range: str | None = None
    name: str | None = None
    unique_index: str = "upc"  # DataSetCollection.php:8 default key
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def is_multi_source(self) -> bool:
        return self.type_id is None

    @staticmethod
    def from_message(msg: dict[str, Any] | str) -> "InputConfig":
        if isinstance(msg, str):
            try:
                msg = json.loads(msg)
            except json.JSONDecodeError as e:
                raise InvalidConfigError(f"job message is not valid JSON: {e}") from e
        if not isinstance(msg, dict):
            raise InvalidConfigError(f"job message must be an object, got {type(msg)}")

        for req in ("supplier_id", "source", "column_map_rules", "version"):
            if req not in msg or msg[req] in (None, ""):
                raise InvalidConfigError(f"job message missing required field {req!r}")
        if not isinstance(msg["column_map_rules"], dict) or not msg["column_map_rules"]:
            raise InvalidConfigError("column_map_rules must be a non-empty object")

        type_id = msg.get("type_id")
        source: Any = msg["source"]
        if type_id is None:
            # multi-source: source may arrive as a JSON string — decode, but
            # only accept a list of sub-source objects
            if isinstance(source, str):
                try:
                    source = json.loads(source)
                except json.JSONDecodeError as e:
                    raise InvalidConfigError(
                        "type_id is null but source is not a sub-source array"
                    ) from e
            if not isinstance(source, list) or not source:
                raise InvalidConfigError("multi-source job needs a non-empty source array")
            source = tuple(SubSource.from_dict(s) for s in source)
        else:
            if type_id not in VALID_TYPE_IDS:
                raise InvalidConfigError(f"type_id must be 1..8 or null, got {type_id!r}")
            if not isinstance(source, str):
                raise InvalidConfigError("single-source job needs a string source")

        known = {
            "supplier_id", "source", "column_map_rules", "version",
            "type_id", "range", "name", "unique_index",
        }
        return InputConfig(
            supplier_id=int(msg["supplier_id"]),
            source=source,
            column_map_rules=dict(msg["column_map_rules"]),
            version=int(msg["version"]),
            type_id=int(type_id) if type_id is not None else None,
            range=msg.get("range"),
            name=msg.get("name"),
            unique_index=str(msg.get("unique_index", "upc")),
            extra={k: v for k, v in msg.items() if k not in known},
        )
