"""Incremental derived-table maintenance — CDC in, CDC out.

The engine replicates a source table from a change stream; real
pipelines then CHAIN: a curated/projected derivative of the
replicated table feeds training or serving. Rebuilding that
derivative per batch costs O(table); this module maintains it from
`SnapshotTable.diff()` instead — O(changes applied since the last
sync), the same incremental philosophy as the engine's own MERGE and
the dedup index.

Semantics: `dst = transform(rows of src passing gate)`, key-preserving
row-wise `transform` (project/derive columns; no aggregation — the
per-key change feed cannot incrementally maintain cross-row state),
boolean `gate` column expression evaluated on the TRANSFORMED row.
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
