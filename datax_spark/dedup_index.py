"""MinHashIndex — incrementally maintained near-dup index.

Every dedup query in textops.py recomputes signatures over the FULL
corpus; the production shape at 10^10 documents is incremental, the
same philosophy as the CDC engine itself: documents arrive in batches,
so each batch should pay signature cost for ITS OWN rows only, find
its near-duplicates against a PERSISTED index, and then merge its
signatures in — never a full recompute.

The index is a SnapshotTable (the engine's own transactional backend),
which buys the whole table feature set for free: exactly-once adds
(batch-id ledger — a replayed micro-batch emits no duplicate pairs and
no duplicate signatures), deletes for retired docs, time travel,
vacuum, optimistic concurrency.

Scale shape of add_batch (N = corpus, B = batch, B << N):
  * shingle + sha256 + band-min: O(B) map-side work — the expensive
    text stage never touches the corpus again;
  * candidate join: batch buckets (n_bands·B rows) hash-joined against
    index buckets (n_bands·N rows) on (band, bucket) — Spark
    broadcasts the batch side when small, so the index side streams
    through without a shuffle; bucket keys are 64-bit hex of sha256 →
    uniform, skew-free;
  * pair math: only pairs with ≥1 batch member — O(B·dup_rate), never
    O(N²) and never even O(N log N) per batch;
  * signature MERGE: bucketed copy-on-write costed by batch size
    (SnapshotTable.merge rewrites only affected buckets).

Equivalence invariant (pytest-pinned): feeding a corpus in ANY batch
split and unioning each add_batch's pairs equals minhash_lsh_pairs on
the full corpus, exactly — both run the same signature expressions
(textops.minhash_band_minima), and a pair {x, y} is emitted exactly
once, by whichever batch completes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .table import SnapshotTable
from .textops import band_buckets, minhash_band_minima


class MinHashIndex:
    def __init__(self, table: SnapshotTable, n_bands: int, k: int, stride: int):
        self.table = table
        self.n_bands = n_bands
        self.k = k
        self.stride = stride

    # ---------- lifecycle ----------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        location: str,
        n_bands: int = 4,
        k: int = 8,
        stride: int = 4,
        id_type: str = "long",
        num_buckets: int = 32,
    ) -> "MinHashIndex":
        """Index schema: doc_id (key) + one 16-hex band-min column per
        band + the LSH parameters pinned in table metrics (a mixed-
        parameter index would silently miss duplicates, so load()
        restores and add_batch reuses exactly these)."""
        fields = [T.StructField("doc_id", _parse_simple(id_type), False)]
        fields += [
            T.StructField(f"_b{i}", T.StringType(), True) for i in range(n_bands)
        ]
        table = SnapshotTable.create(
            spark, location, T.StructType(fields),
            key_cols=["doc_id"], num_buckets=num_buckets,
        )
        # Pin the parameters in a commit so load() can restore them.
        table.evolve_schema(
            T.StructType(fields),
            change=f"minhash_params:n_bands={n_bands},k={k},stride={stride}",
        )
        return cls(table, n_bands, k, stride)

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "MinHashIndex":
        table = SnapshotTable.load(spark, location)
        params = {}
        for rec in table.history():
            change = str(rec.get("metrics", {}).get("schema_change", ""))
            if change.startswith("minhash_params:"):
                params = dict(
                    kv.split("=") for kv in change.split(":", 1)[1].split(",")
                )
        if not params:
            raise ValueError(f"{location} is not a MinHashIndex table")
        return cls(table, int(params["n_bands"]), int(params["k"]), int(params["stride"]))

    # ---------- reads ----------

    def signatures(self) -> DataFrame:
        """Current (doc_id, _b0..) signature snapshot."""
        return self.table.snapshot()

    def doc_count(self) -> int:
        return self.signatures().count()

    # ---------- incremental maintenance ----------

    def add_batch(
        self,
        docs: DataFrame,
        batch_id: str | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Ingest a document batch: returns the NEW candidate pairs
        (id_a < id_b) this batch completes — batch-vs-index plus
        batch-vs-batch — and merges the batch's signatures into the
        index. Exactly-once: a replayed batch_id skips the merge, and
        its returned pairs are duplicates of already-emitted ones only
        (callers folding pairs into a cluster table get idempotence
        from pair identity).

        Re-ingested doc_ids (content edits) get their signature
        REPLACED (LWW); pairs previously emitted for the old content
        are the caller's cluster state, not the index's."""
        sigs = minhash_band_minima(
            docs, text_col=text_col, id_col=id_col,
            n_bands=self.n_bands, k=self.k, stride=self.stride,
        ).withColumnRenamed(id_col, "doc_id")

        batch_b = band_buckets(sigs, id_col="doc_id", n_bands=self.n_bands)
        index_b = band_buckets(
            self.signatures(), id_col="doc_id", n_bands=self.n_bands
        )
        # Pairs with ≥1 batch member: batch side joined against
        # (index ∪ batch). Normalizing to (least, greatest) + distinct
        # collapses the double emission of batch-vs-batch pairs (each
        # side of the join sees them once). Index-vs-index pairs are
        # never generated — earlier batches already emitted them.
        other = index_b.unionByName(batch_b)
        a, b = batch_b.alias("a"), other.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
            )
            .distinct()
        )
        # Materialize pairs BEFORE the merge mutates the index (lazy
        # evaluation would otherwise join the batch against itself via
        # the post-merge snapshot and double-count).
        pairs = pairs.localCheckpoint(eager=True)

        lsn = self.table.current()["version"] + 1
        self.table.merge(
            sigs.withColumn("lsn", F.lit(lsn).cast("long"))
            .withColumn("op", F.lit("U")),
            batch_id=batch_id,
        )
        return pairs

    def remove_docs(self, ids: DataFrame, batch_id: str | None = None) -> None:
        """Retire documents (takedowns, retention): tombstones their
        signatures so future batches stop matching against them."""
        lsn = self.table.current()["version"] + 1
        batch = ids.select("doc_id").withColumn("lsn", F.lit(lsn).cast("long")).withColumn(
            "op", F.lit("D")
        )
        self.table.merge(batch, batch_id=batch_id)


def _parse_simple(name: str) -> T.DataType:
    return {
        "long": T.LongType(), "int": T.IntegerType(), "string": T.StringType(),
    }[name]
