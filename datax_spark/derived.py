"""Incremental derived-table maintenance — CDC in, CDC out.

The engine replicates a source table from a change stream; real
pipelines then CHAIN: a curated/projected derivative of the
replicated table feeds training or serving. Rebuilding that
derivative per batch costs O(table); this module maintains it from
`SnapshotTable.diff()` instead — O(changes applied since the last
sync), the same incremental philosophy as the engine's own MERGE and
the dedup index.

Two maintenance shapes:

* `sync_derived` — row-wise views: `dst = transform(rows of src
  passing gate)`, key-preserving `transform` (project/derive columns),
  boolean `gate` column expression evaluated on the TRANSFORMED row.
* `sync_derived_agg` (r5) — GROUPED views: `dst = SELECT group_cols,
  count(*), sum(...) FROM transform(src) WHERE gate GROUP BY
  group_cols`, maintained by DELTA-AGGREGATION over the change feed:
  each changed row contributes (+new image, −old image), so an update
  is −old +new, a delete is −old, and a group whose count reaches 0 is
  deleted from the derivative. Only self-decomposable aggregates
  (count / sum — and avg as sum÷count downstream) qualify; min/max
  need a per-group recompute on retraction and are rejected loudly.
  Cost per sync: O(changed rows) contributions + a bucket-pruned read
  of O(changed groups) current values — never a full re-aggregation.
The subtlety a naive implementation misses: a source UPDATE can flip
a row OUT of the gate, which must DELETE it from the derivative —
gate-fail rows become op='D', not silently-skipped rows.

Exactly-once: the sync batch id is derived from the (from_version,
to_version) range, so replaying a crashed sync is a ledgered no-op;
the destination commit records `src_version` in its metrics, which is
also where the next sync resumes from. Derived-row lsn = source
version (monotonic across syncs), so late/duplicate syncs can never
regress the derivative and tombstones age correctly.

At 100 TB: each sync reads only the diff between two retained
snapshots (one key-bucketed full-outer join over the CHANGED buckets'
data) and merges O(changed keys) rows — the derivative's cost tracks
change volume, not corpus size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from .table import CommitInfo, SnapshotTable


def last_synced_version(dst: SnapshotTable) -> int | None:
    """The source version the destination is current through (None =
    never synced). Reads the compacted ledger summary — which folds
    metrics.src_version across ALL commits, including ones later
    expired by retention (expire_snapshots compacts first) — so the
    watermark can no longer regress to None when the sync commit ages
    out of retained history, and a resync at an unchanged src version
    stays the cheap ledgered no-op instead of a repeated full-resync."""
    return dst.ledger_summary()["max_src_version"]


def sync_derived(
    src: SnapshotTable,
    dst: SnapshotTable,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    gate: Column | None = None,
    batch_prefix: str = "sync",
) -> CommitInfo | None:
    """One incremental refresh of dst from src's change feed. Returns
    the commit, or None when dst is already current. Invariant (pinned
    in tests): after any sequence of syncs at any cadence, dst ==
    transform(src.snapshot()).filter(gate) exactly."""
    cur = src.current()["version"]
    key_cols = dst.key_cols
    last = last_synced_version(dst)
    if last is not None and last >= cur:
        return None

    def _full_resync() -> DataFrame:
        # Full resync: current snapshot as upserts plus an anti-join
        # for keys the derivative holds that no longer exist in the
        # source — O(table) once, instead of a broken or lossy chain.
        stale = (
            dst.snapshot().select(*key_cols)
            .join(src.snapshot().select(*key_cols), on=key_cols, how="left_anti")
            .withColumn("_change", F.lit("D"))
        )
        return (
            src.snapshot().withColumn("_change", F.lit("I"))
            .unionByName(stale, allowMissingColumns=True)
        )

    if last is None:
        # First sync — or a REGRESSED watermark (dst's sync commit was
        # expired by retention while non-sync commits survived): the
        # derivative may already hold rows, so the resync must include
        # the stale-key delete pass, not just snapshot-as-inserts.
        changes = _full_resync()
    else:
        try:
            changes = src.diff(last, cur)
        except FileNotFoundError:
            # the synced-from SOURCE snapshot was expired between syncs
            changes = _full_resync()

    live = changes.filter(F.col("_change") != "D").drop("_change")
    if transform is not None:
        live = transform(live)
    dels = changes.filter(F.col("_change") == "D").select(*key_cols)
    if gate is not None:
        # Rows that no longer pass the gate must LEAVE the derivative.
        # NULL-gate rows count as failing: without the coalesce they
        # would fall through BOTH filters (NULL and NOT NULL are both
        # non-true) and leave a stale row behind.
        gate_true = F.coalesce(gate, F.lit(False))
        dels = dels.unionByName(live.filter(~gate_true).select(*key_cols))
        live = live.filter(gate_true)

    batch = live.withColumn("op", F.lit("U")).unionByName(
        dels.withColumn("op", F.lit("D")), allowMissingColumns=True
    ).withColumn("lsn", F.lit(int(cur)).cast("long"))

    return dst.merge(
        batch,
        batch_id=f"{batch_prefix}-{'' if last is None else last}-{cur}",
        metrics={"src_version": cur},
        lineage=[{"source": f"derived:{src.location}@{last}..{cur}",
                  "min_lsn": int(cur), "max_lsn": int(cur), "rows": -1}],
    )


def sync_derived_agg(
    src: SnapshotTable,
    dst: SnapshotTable,
    aggs: dict[str, tuple],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    gate: Column | None = None,
    batch_prefix: str = "aggsync",
) -> CommitInfo | None:
    """One incremental refresh of a GROUPED derivative (see module
    docstring). dst is keyed on the group columns (dst.key_cols);
    `aggs` maps output column → ("count",) | ("sum", <input col>), and
    must include at least one count — the group-liveness witness that
    tells the sync when a group has emptied and must be DELETED.

    Invariant (pinned in tests): after any sequence of syncs at any
    cadence — including delete-heavy streams and gate flips — dst ==
    full re-aggregation of transform(src.snapshot()).filter(gate).
    Integer sums/counts match EXACTLY; float sums accumulate the usual
    re-association drift and should be rounded downstream.

    NULL semantics of ("sum", col): the maintained value is
    sum(coalesce(col, 0)) — NULL inputs contribute 0, and a live group
    whose inputs are all NULL holds 0, not NULL. This is forced by
    delta maintenance (a retraction of an unknown NULL-ness cannot be
    distinguished from retracting 0 without per-group recount) and is
    applied IDENTICALLY in the incremental and full-resync paths, so
    the equality invariant holds. Consumers needing ANSI sum-NULL
    semantics should pair the sum with a non-null count and read
    CASE WHEN nn = 0 THEN NULL ELSE s END.

    Exactly-once and watermarking ride the same machinery as
    sync_derived: batch id from the (from, to) version range, derived
    lsn = source version, watermark in commit metrics folded into the
    compacted ledger summary."""
    group_cols = dst.key_cols
    count_cols = [name for name, spec in aggs.items() if spec[0] == "count"]
    if not count_cols:
        raise ValueError("aggs needs a ('count',) entry — it witnesses group liveness")
    for name, spec in aggs.items():
        if spec[0] not in ("count", "sum"):
            raise ValueError(
                f"agg {name!r}: {spec[0]!r} is not delta-maintainable "
                "(only count/sum decompose under retraction; min/max need "
                "a per-group recompute — use sync_derived on the rows instead)"
            )

    cur = src.current()["version"]
    last = last_synced_version(dst)
    if last is not None and last >= cur:
        return None

    def _prepared(df: DataFrame) -> DataFrame:
        if transform is not None:
            df = transform(df)
        if gate is not None:
            df = df.filter(F.coalesce(gate, F.lit(False)))
        return df

    def _agg_exprs():
        out = []
        for name, spec in aggs.items():
            if spec[0] == "count":
                out.append(F.count(F.lit(1)).cast("long").alias(name))
            else:
                # coalesce BEFORE summing — the documented NULL
                # semantics, and the exact expression the incremental
                # path's ±contributions decompose (plain sum() would
                # yield NULL for an all-NULL group here but 0 there)
                out.append(F.sum(F.coalesce(F.col(spec[1]), F.lit(0))).alias(name))
        return out

    full = last is None
    changes = None
    if not full:
        try:
            changes = src.diff(last, cur, include_old=True)
        except FileNotFoundError:
            full = True  # the synced-from source snapshot was expired

    if full:
        fresh = _prepared(src.snapshot()).groupBy(*group_cols).agg(*_agg_exprs())
        stale = (
            dst.snapshot().select(*group_cols)
            .join(fresh.select(*group_cols), on=group_cols, how="left_anti")
        )
        batch = fresh.withColumn("op", F.lit("U")).unionByName(
            stale.withColumn("op", F.lit("D")), allowMissingColumns=True
        )
    else:
        data_cols = [c for c in changes.columns
                     if c != "_change" and not c.startswith("_old_")]
        new_rows = changes.filter(F.col("_change") != "D").select(*data_cols)
        old_rows = changes.filter(F.col("_change") != "I").select(
            *[F.col(f"_old_{c}").alias(c) for c in data_cols]
        )
        contrib = _prepared(new_rows).withColumn("_w", F.lit(1)).unionByName(
            _prepared(old_rows).withColumn("_w", F.lit(-1))
        )
        # per-group deltas: ONE shuffle with map-side partial agg
        d_exprs = []
        for name, spec in aggs.items():
            if spec[0] == "count":
                d_exprs.append(F.sum(F.col("_w")).cast("long").alias(f"_d_{name}"))
            else:
                d_exprs.append(
                    F.sum(F.col("_w") * F.coalesce(F.col(spec[1]), F.lit(0))).alias(f"_d_{name}")
                )
        deltas = contrib.groupBy(*group_cols).agg(*d_exprs)
        nonzero = None
        for name in aggs:
            c = F.coalesce(F.col(f"_d_{name}"), F.lit(0)) != 0
            nonzero = c if nonzero is None else (nonzero | c)
        deltas = deltas.filter(nonzero)
        # current values for ONLY the touched groups (bucket-pruned)
        cur_vals = dst.snapshot_for_keys(deltas.select(*group_cols))
        j = deltas.join(cur_vals, on=group_cols, how="left")
        applied = []
        for name, spec in aggs.items():
            zero = F.lit(0).cast("long") if spec[0] == "count" else F.lit(0)
            applied.append(
                (F.coalesce(F.col(name), zero) + F.col(f"_d_{name}")).alias(name)
            )
        emptied = F.coalesce(F.col(count_cols[0]), F.lit(0)) + F.col(f"_d_{count_cols[0]}") == 0
        batch = j.select(
            *group_cols, *applied,
            F.when(emptied, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        )

    batch = batch.withColumn("lsn", F.lit(int(cur)).cast("long"))
    return dst.merge(
        batch,
        batch_id=f"{batch_prefix}-{'' if last is None else last}-{cur}",
        metrics={"src_version": cur},
        lineage=[{"source": f"derived:{src.location}@{last}..{cur}",
                  "min_lsn": int(cur), "max_lsn": int(cur), "rows": -1}],
    )
