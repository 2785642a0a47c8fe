"""Schema-epoch registry — live column add/drop/retype.

The reference handles schema change only by editing the job JSON's
`column` lists and re-running (SURVEY.md §1.1); the north rule requires
it live. The WAL carries a `schema_epoch` column; this registry maps
each epoch to the payload schema, and the engine evolves the target
table (metadata-only commit, files aligned on read) when events from a
newer epoch arrive.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def parse_type(name: str) -> T.DataType:
    return _TYPES[name.strip().lower()]


class EpochRegistry:
    """Ordered list of epoch entries:
    {"epoch": int, "change": str, "columns": {name: typename}}."""

    def __init__(self, entries: list[dict], key_cols: list[str] | None = None):
        self.entries = sorted(entries, key=lambda e: e["epoch"])
        self.key_cols = key_cols or ["repo", "path"]
        by_epoch = {e["epoch"]: e for e in self.entries}
        if sorted(by_epoch) != list(range(len(self.entries))):
            raise ValueError("epochs must be contiguous from 0")

    @classmethod
    def from_json(cls, path: str, key_cols: list[str] | None = None) -> "EpochRegistry":
        with open(path) as f:
            return cls(json.load(f), key_cols=key_cols)

    @property
    def max_epoch(self) -> int:
        return self.entries[-1]["epoch"]

    def schema_for(self, epoch: int) -> T.StructType:
        """Full table schema at an epoch: key cols + that epoch's payload."""
        entry = self.entries[epoch]
        fields = [T.StructField(k, T.StringType(), False) for k in self.key_cols]
        fields += [
            T.StructField(name, parse_type(tp), True) for name, tp in entry["columns"].items()
        ]
        return T.StructType(fields)

    def change_for(self, epoch: int) -> str:
        return self.entries[epoch].get("change", "")

    def wal_schema(self) -> T.StructType:
        """Schema of the WAL files: envelope + union of all epochs'
        payload columns at their WIDEST type (cross-epoch files must be
        readable with one schema; per-event alignment happens after)."""
        widest: dict[str, T.DataType] = {}
        for e in self.entries:
            for name, tp in e["columns"].items():
                dt = parse_type(tp)
                prev = widest.get(name)
                widest[name] = _wider(prev, dt) if prev else dt
        fields = [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
        ]
        fields += [T.StructField(k, T.StringType(), False) for k in self.key_cols]
        fields += [T.StructField(n, t, True) for n, t in widest.items()]
        fields += [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("schema_epoch", T.IntegerType(), True),
        ]
        return T.StructType(fields)


_WIDTH = [T.IntegerType(), T.LongType(), T.DoubleType()]


def _wider(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    if a in _WIDTH and b in _WIDTH:
        return _WIDTH[max(_WIDTH.index(a), _WIDTH.index(b))]
    raise ValueError(f"no widening from {a} to {b}")
