"""Transformer chain — the reference's per-record transformers,
re-expressed as Catalyst column expressions (SURVEY.md §2.3, registry
[UP core/.../core/transport/transformer/TransformerRegistry.java]).

Every dx_* below stays JVM-side inside whole-stage codegen; the only
Python hop is `vectorized()` (the dx_groovy escape hatch), which is an
Arrow-batched pandas UDF — never per-row Python (BASELINE.json
input_hint).

Also here: the dirty-data / error-limit model (SURVEY.md §2.8,
[UP core/.../core/util/ErrorRecordChecker.java]): bad records are
diverted to a quarantine side-output and the job aborts only when the
configured record-count / percentage limit is exceeded.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------- dx_* ops


def dx_substr(col: str | Column, start: int, length: int) -> Column:
    """Reference dx_substr(columnIndex, startIndex, length); start is
    0-based there, Spark substring is 1-based."""
    return F.substring(F.col(col) if isinstance(col, str) else col, start + 1, length)


def dx_pad(col: str | Column, side: str, pad_len: int, pad_str: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if side == "l":
        return F.lpad(c, pad_len, pad_str)
    if side == "r":
        return F.rpad(c, pad_len, pad_str)
    raise ValueError(f"side must be 'l' or 'r', got {side!r}")


def dx_replace(col: str | Column, start: int, length: int, replacement: str) -> Column:
    """Splice-replace a character range (reference dx_replace) =
    SQL OVERLAY; start 0-based in the reference, 1-based here."""
    c = F.col(col) if isinstance(col, str) else col
    return F.overlay(c, F.lit(replacement), start + 1, length)


_FILTER_OPS: dict[str, Callable[[Column, str], Column]] = {
    "like": lambda c, v: c.like(v),
    "not like": lambda c, v: ~c.like(v),
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
}


def dx_filter(df: DataFrame, col: str, op: str, value) -> DataFrame:
    """Reference dx_filter DROPS the whole record when the predicate
    matches (inverse of SQL WHERE — kept faithful)."""
    pred = _FILTER_OPS[op](F.col(col), value)
    # null comparison → null → record NOT dropped (reference keeps it)
    return df.filter(~F.coalesce(pred, F.lit(False)))


def dx_cast(col: str | Column, to_type: str) -> Column:
    """Lenient cast: failure → NULL (pair with quarantine below), the
    Spark-native form of Column.as*() throwing CONVERT_NOT_SUPPORT."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(to_type)


def derive_lang(path_col: str | Column) -> Column:
    """lang from path extension — engine transform stage (SURVEY.md §2.3)."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    ext = F.lower(F.element_at(F.split(c, r"\."), -1))
    mapping = {
        "py": "python", "scala": "scala", "sql": "sql", "md": "markdown",
        "java": "java", "rs": "rust", "go": "go", "js": "javascript",
        "ts": "typescript", "c": "c", "h": "c", "cpp": "cpp", "rb": "ruby",
    }
    expr = F.lit(None).cast("string")
    for k, v in reversed(mapping.items()):
        expr = F.when(ext == k, F.lit(v)).otherwise(expr)
    return expr


def content_sha256(col: str | Column) -> Column:
    """The per-row verification invariant — pure SQL sha2, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def content_sha256_pandas():
    """Pandas-UDF twin of content_sha256 — used only in tests to prove
    UDF-path parity (hashing 10^10 rows in Python would dominate)."""
    import hashlib

    @F.pandas_udf("string")
    def _sha(s: pd.Series) -> pd.Series:
        return s.map(lambda x: hashlib.sha256(x.encode()).hexdigest() if x is not None else None)

    return _sha


def vectorized(out_type: str, fn: Callable[..., pd.Series]):
    """dx_groovy equivalent: arbitrary per-batch compute as an
    Arrow-vectorized pandas UDF (pd.Series in → pd.Series out)."""
    return F.pandas_udf(out_type)(fn)


# Named-UDF registry: makes `vectorized` reachable from a job SPEC
# (job.py's dx_python transformer) — the reference ships dx_groovy in
# the job JSON; our escape hatch is a registered pandas UDF.
UDF_REGISTRY: dict[str, object] = {}


def register_udf(name: str, out_type: str, fn: Callable[..., pd.Series]) -> None:
    """Register an Arrow-vectorized UDF under `name` for use by job
    specs: {"name": "dx_python", "parameter": {"udf": name, ...}}."""
    UDF_REGISTRY[name] = vectorized(out_type, fn)


# ------------------------------------------------- pipeline + dirty data


@dataclass
class Transform:
    """One step: either withColumn(name, col_fn(df)) or a df→df fn."""

    name: str
    fn: Callable[[DataFrame], DataFrame]


class TransformPipeline:
    """Ordered transformer chain, the reference's
    BufferedRecordTransformerExchanger re-expressed declaratively —
    Catalyst fuses the whole chain into one codegen stage."""

    def __init__(self, steps: Iterable[Transform] = ()):
        self.steps = list(steps)

    def with_column(self, name: str, col: Column) -> "TransformPipeline":
        self.steps.append(Transform(name, lambda df, c=col, n=name: df.withColumn(n, c)))
        return self

    def transform(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> "TransformPipeline":
        self.steps.append(Transform(name, fn))
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            df = step.fn(df)
        return df


class DirtyDataLimitExceeded(RuntimeError):
    pass


@dataclass
class ErrorLimit:
    """job.setting.errorLimit.{record,percentage} semantics."""

    record: int | None = None
    percentage: float | None = None

    def check(self, n_bad: int, n_total: int) -> None:
        if self.record is not None and n_bad > self.record:
            raise DirtyDataLimitExceeded(f"{n_bad} dirty records > limit {self.record}")
        if self.percentage is not None and n_total > 0 and n_bad / n_total > self.percentage:
            raise DirtyDataLimitExceeded(
                f"dirty ratio {n_bad / n_total:.4f} > limit {self.percentage}"
            )


def quarantine(df: DataFrame, ok_cond: Column) -> tuple[DataFrame, DataFrame]:
    """Side-output split: (clean, dirty). The TaskPluginCollector
    .collectDirtyRecord analogue — one cached scan, two filters."""
    tagged = df.withColumn("_ok", F.coalesce(ok_cond, F.lit(False)))
    return tagged.filter(F.col("_ok")).drop("_ok"), tagged.filter(~F.col("_ok")).drop("_ok")


def map_in_arrow_sha(df: DataFrame, text_col: str, out_col: str = "sha_arrow") -> DataFrame:
    """mapInArrow variant of the content-sha transform: batches arrive
    as pyarrow RecordBatches (zero pandas conversion — the leanest
    Python hop Spark offers). Used to prove the Arrow-native UDF path
    produces byte-identical results to the JVM sha2 (§2.10)."""
    import hashlib

    import pyarrow as pa

    schema_names = df.columns + [out_col]

    def _sha_batches(batches):
        for batch in batches:
            col = batch.column(batch.schema.get_field_index(text_col))
            shas = pa.array(
                [
                    hashlib.sha256(v.encode()).hexdigest() if v is not None else None
                    for v in col.to_pylist()
                ],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [shas],
                names=schema_names,
            )

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} string"]
    )
    return df.mapInArrow(_sha_batches, out_schema)


def word_window_udtf():
    """Python UDTF (§2.10 — the table-function escape hatch, Spark 4's
    analogue of a user-defined exploder): splits a text into
    fixed-size word windows, one OUTPUT ROW per window. Returns the
    decorated class for registration/lateral use. This exists to cover
    the UDTF surface; the PRODUCTION chunker is the codegen array form
    (textops.chunk_token_windows) — per-row Python table functions are
    the slow path by design rule."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk: string, idx: int")
    class WordWindows:
        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            if not toks:
                return
            for i in range(0, len(toks), n):
                yield " ".join(toks[i:i + n]), i // n

    return WordWindows


def weighted_mean_udaf():
    """Grouped-aggregate pandas UDF (§2.10 — the UDAF surface):
    weight-averaged value per group, vectorized over each group's
    Arrow batch. Spark plans it like any aggregate (map-side partials
    are NOT available for grouped-agg pandas UDFs — one shuffle of the
    raw rows — which is why built-in aggregates remain the hot path;
    this covers the API for the aggregations no built-in expresses)."""
    import pandas as pd

    @F.pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        den = w.sum()
        return float((v * w).sum() / den) if den else float("nan")

    return weighted_mean
