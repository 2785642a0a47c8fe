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
    (SnapshotTable.merge rewrites only affected buckets) — or, with
    merge_strategy='mor' on the index, an O(batch) merge-on-read delta
    commit with inline per-hot-bucket compaction: the right mode when
    batches are small and doc_ids spread across every bucket (the
    usual case, since ids hash uniformly).

Equivalence invariant (pytest-pinned): feeding a corpus in ANY batch
split and unioning each add_batch's pairs equals minhash_lsh_pairs on
the full corpus, exactly — both run the same signature expressions
(textops.minhash_band_minima), and a pair {x, y} is emitted exactly
once, by whichever batch completes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .table import CommitInfo, SnapshotTable
from .textops import band_buckets, minhash_band_minima


def _merged(
    table: SnapshotTable, batch: DataFrame, batch_id: str | None,
    strategy: str, threshold: int,
) -> CommitInfo:
    """Index-table merge honoring the owner's merge strategy. Index
    adds are exactly MOR's shape — small frequent batches whose doc_ids
    hash across every bucket, so each COW add rewrites ~the whole
    signature table while MOR writes O(batch) deltas; the same inline
    per-hot-bucket compaction policy as CDCEngine bounds read
    amplification."""
    ci = table.merge(batch, batch_id=batch_id, strategy=strategy)
    if strategy == "mor" and not ci.skipped:
        table.compact_hot_buckets(threshold)
    return ci


class MinHashIndex:
    # 'mor' turns every signature/cluster merge into an O(batch) delta
    # commit (see _merged) — flip on the instance after create()/load().
    merge_strategy: str = "cow"
    mor_compact_threshold: int = 8

    def __init__(self, table: SnapshotTable, n_bands: int, k: int, stride: int):
        self.table = table
        self.n_bands = n_bands
        self.k = k
        self.stride = stride

    def _merge(self, batch: DataFrame, batch_id: str | None) -> CommitInfo:
        return _merged(self.table, batch, batch_id,
                       self.merge_strategy, self.mor_compact_threshold)

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
        # Pin the parameters in a commit (audit trail) AND a static
        # sidecar: params are immutable at create, and the sidecar
        # survives expire_snapshots, which prunes the commit that
        # carries the metrics record (history()-only recovery would
        # break load() after routine maintenance).
        table.evolve_schema(
            T.StructType(fields),
            change=f"minhash_params:n_bands={n_bands},k={k},stride={stride}",
        )
        _write_index_params(
            location, "minhash", {"n_bands": n_bands, "k": k, "stride": stride}
        )
        return cls(table, n_bands, k, stride)

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "MinHashIndex":
        table = SnapshotTable.load(spark, location)
        params = _read_index_params(location, "minhash")
        if params is None:  # pre-sidecar index: recover from history
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
        # LWW on the index side: a doc re-ingested IN THIS BATCH
        # supersedes its stored signature, so the stale one must not
        # participate in pairing (it could pair a batch doc with
        # content that no longer exists — a pair a full recompute
        # would never emit). Same anti-join the embedding index uses.
        index_b = band_buckets(
            self.signatures().join(
                sigs.select("doc_id"), on="doc_id", how="left_anti"
            ),
            id_col="doc_id", n_bands=self.n_bands,
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
        self._merge(
            sigs.withColumn("lsn", F.lit(lsn).cast("long"))
            .withColumn("op", F.lit("U")),
            batch_id,
        )
        return pairs

    def remove_docs(self, ids: DataFrame, batch_id: str | None = None) -> None:
        """Retire documents (takedowns, retention): tombstones their
        signatures so future batches stop matching against them."""
        lsn = self.table.current()["version"] + 1
        batch = ids.select("doc_id").withColumn("lsn", F.lit(lsn).cast("long")).withColumn(
            "op", F.lit("D")
        )
        self._merge(batch, batch_id)


def _parse_simple(name: str) -> T.DataType:
    return {
        "long": T.LongType(), "int": T.IntegerType(), "string": T.StringType(),
    }[name]


def _edges_location(location: str) -> str:
    import os

    return os.path.join(location.rstrip("/"), "edges")


def _params_path(location: str) -> str:
    import os

    return os.path.join(location, "_index.json")


def _write_index_params(location: str, kind: str, params: dict) -> None:
    import json

    with open(_params_path(location), "w") as fh:
        json.dump({"kind": kind, **params}, fh)


def _read_index_params(location: str, kind: str) -> dict | None:
    import json
    import os

    p = _params_path(location)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        rec = json.load(fh)
    if rec.get("kind") != kind:
        raise ValueError(f"{location} holds a {rec.get('kind')} index, not {kind}")
    return {k: v for k, v in rec.items() if k != "kind"}


def run_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    index: "MinHashIndex | EmbeddingLSHIndex",
    clusters: ClusterTable | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: T.StructType | str | None = None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    threshold: float = 0.4,
):
    """The streaming front-end of the incremental dedup pipeline —
    the same Structured-Streaming shape as CDCEngine.run_stream, but
    the sink is the signature index (+ optionally the cluster table)
    instead of the CDC snapshot: documents land as parquet files in
    `docs_dir`; each micro-batch computes its own signatures, emits
    pairs against the persisted index, folds them into cluster
    assignments, and MERGEs its signatures in.

    Exactly-once rides the SAME mechanism as the CDC engine: the
    streaming checkpoint replays a micro-batch at-least-once; the
    batch-id ledger in each SnapshotTable makes the replay a no-op
    (the index merge skips, the cluster fold skips). Restarting with
    the same checkpoint resumes exactly where it left off — killing
    the query mid-corpus and re-running converges to the identical
    cluster table a one-shot run produces (test_dedup_index).

    Works for both index kinds: a MinHashIndex consumes
    (id_col, text_col) rows; an EmbeddingLSHIndex consumes
    (id_col, text_col=<vector column>) rows, scoring candidate pairs
    at `threshold`."""
    embedding = isinstance(index, EmbeddingLSHIndex)
    if schema is None:
        content = "array<double>" if embedding else "string"
        schema = f"{id_col} long, {text_col} {content}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", "*.parquet")
        .parquet(docs_dir)
    )

    # Per-checkpoint epoch ids restart at 0, so the batch id carries
    # the checkpoint identity — a second document drop streamed with a
    # fresh checkpoint into the SAME index must not collide with the
    # first stream's ledger entries (same fix as CDCEngine.run_stream).
    from .engine import _checkpoint_tag

    ckpt_tag = _checkpoint_tag(checkpoint_dir)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        batch_id = f"stream-{ckpt_tag}-{epoch_id}"
        if embedding:
            pairs = index.add_batch(
                df, batch_id=batch_id, id_col=id_col, vec_col=text_col,
                threshold=threshold,
            )
        else:
            pairs = index.add_batch(
                df, batch_id=batch_id, text_col=text_col, id_col=id_col
            )
        if clusters is not None:
            clusters.add_pairs(pairs, batch_id=batch_id)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class ClusterTable:
    """Incrementally maintained dedup CLUSTER assignments — the
    downstream half of the incremental index: each batch's new
    candidate pairs (MinHashIndex / EmbeddingLSHIndex .add_batch
    output) fold into a persisted (doc_id, cluster_id) table without
    re-clustering the corpus.

    Incremental rule: a new edge can only change the components it
    touches, so re-clustering runs on the TOUCHED SUBGRAPH only —
    the new edges plus one (member → current cluster_id) edge per
    member of every touched cluster (cluster_id is itself a member
    node id, the component min, so these edges reproduce the old
    components exactly). connected_components over that subgraph
    yields the updated labels, which MERGE in (LWW). Cost per batch:
    O(new edges + members of touched clusters) — at a steady dup
    rate that is a tiny fraction of the corpus, vs the full-graph
    O(E) re-run the one-shot `dedup_clusters` pays.

    Equivalence invariant (pytest-pinned): folding any batch split of
    an edge set equals connected_components over the full edge set.

    With track_edges=True the real pair edges ALSO persist (a child
    SnapshotTable at <location>/edges, keyed (id_a, id_b)) — the extra
    state that makes document REMOVAL incremental: deleting a node can
    SPLIT a component (the inverse of an edge merge), which is only
    decidable from the surviving edge set. remove_docs re-clusters the
    touched components from their surviving edges; everything else in
    the table is untouched. Without edge tracking, removal would need
    the upstream pair generator to replay the whole corpus."""

    merge_strategy: str = "cow"
    mor_compact_threshold: int = 8

    def _merge(self, table: SnapshotTable, batch: DataFrame,
               batch_id: str | None) -> CommitInfo:
        return _merged(table, batch, batch_id,
                       self.merge_strategy, self.mor_compact_threshold)

    def __init__(self, table: SnapshotTable, edges: SnapshotTable | None = None):
        self.table = table
        self.edges = edges

    @classmethod
    def create(
        cls, spark: SparkSession, location: str, id_type: str = "long",
        num_buckets: int = 32, track_edges: bool = False,
    ) -> "ClusterTable":
        schema = T.StructType([
            T.StructField("doc_id", _parse_simple(id_type), False),
            T.StructField("cluster_id", _parse_simple(id_type), True),
        ])
        table = SnapshotTable.create(
            spark, location, schema, key_cols=["doc_id"], num_buckets=num_buckets
        )
        edges = None
        if track_edges:
            # Child location: the parent only ever scans its own
            # _commits/ and data/ dirs, so edges/ is invisible to
            # vacuum/manifest reads.
            edges = SnapshotTable.create(
                spark, _edges_location(location),
                T.StructType([
                    T.StructField("id_a", _parse_simple(id_type), False),
                    T.StructField("id_b", _parse_simple(id_type), False),
                ]),
                key_cols=["id_a", "id_b"], num_buckets=num_buckets,
            )
        return cls(table, edges)

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "ClusterTable":
        import os

        eloc = _edges_location(location)
        edges = None
        if os.path.isdir(os.path.join(eloc, "_commits")):
            edges = SnapshotTable.load(spark, eloc)
        return cls(SnapshotTable.load(spark, location), edges)

    def assignments(self) -> DataFrame:
        """Current (doc_id, cluster_id); cluster_id = min member id,
        so `WHERE doc_id = cluster_id` selects representatives."""
        return self.table.snapshot()

    def add_pairs(self, pairs: DataFrame, batch_id: str | None = None) -> None:
        """Fold a batch of candidate pairs (id_a, id_b) in. New edges
        may merge previously separate clusters — every member of a
        touched cluster is pulled into the subgraph so merged
        components relabel consistently (all members get the new
        global min)."""
        from .graph import connected_components

        if batch_id is not None and batch_id in self.table.committed_batch_ids():
            return
        edges = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
        if self.edges is not None:
            # Edge log commits FIRST: the exactly-once guard above keys
            # on the ASSIGNMENTS ledger, so a crash between the two
            # merges replays into an edge-ledger no-op + the missing
            # assignments merge.
            elsn = self.edges.current()["version"] + 1
            self._merge(
                self.edges,
                edges.withColumn("lsn", F.lit(elsn).cast("long"))
                .withColumn("op", F.lit("U")),
                batch_id,
            )
        labels = self.assignments()
        touched = (
            edges.select(F.col("id_a").alias("doc_id"))
            .unionByName(edges.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        touched_clusters = (
            labels.join(touched, on="doc_id", how="left_semi")
            .select("cluster_id").distinct()
        )
        members = labels.join(
            touched_clusters, on="cluster_id", how="left_semi"
        )
        sub_edges = edges.unionByName(
            members.select(
                F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
            )
        )
        new_labels = connected_components(sub_edges).localCheckpoint(eager=True)
        lsn = self.table.current()["version"] + 1
        self._merge(
            self.table,
            new_labels.withColumn("lsn", F.lit(lsn).cast("long"))
            .withColumn("op", F.lit("U")),
            batch_id,
        )

    def remove_docs(self, ids: DataFrame, batch_id: str | None = None) -> None:
        """Retire documents from the cluster table (the counterpart of
        MinHashIndex.remove_docs). Removal can SPLIT a component — a
        bridge doc's clusters fall apart — so the touched clusters are
        re-clustered from their SURVIVING persisted edges only:
        connected_components over O(touched-cluster edges), never the
        corpus. Survivors left with no edge become singletons
        (cluster_id = doc_id); removed docs' assignment rows and edges
        are tombstoned. Exactly-once per batch_id, same ledger rule as
        add_pairs."""
        from .graph import connected_components

        if self.edges is None:
            raise ValueError(
                "remove_docs needs track_edges=True at create(): splitting "
                "a cluster is only decidable from the surviving edge set"
            )
        if batch_id is not None and batch_id in self.table.committed_batch_ids():
            return
        ids = ids.select("doc_id").distinct().localCheckpoint(eager=True)
        labels = self.assignments()
        touched_clusters = (
            labels.join(ids, on="doc_id", how="left_semi")
            .select("cluster_id").distinct()
        )
        members = labels.join(touched_clusters, on="cluster_id", how="left_semi")
        survivors = (
            members.join(ids, on="doc_id", how="left_anti")
            .select("doc_id").localCheckpoint(eager=True)
        )
        all_edges = self.edges.snapshot()
        # Persisted edges are intra-cluster by construction (an edge
        # merges its endpoints' clusters), so membership of id_a alone
        # selects a touched cluster's whole edge set.
        surviving_edges = (
            all_edges.join(
                members.select(F.col("doc_id").alias("id_a")),
                on="id_a", how="left_semi",
            )
            .join(ids.select(F.col("doc_id").alias("id_a")), on="id_a", how="left_anti")
            .join(ids.select(F.col("doc_id").alias("id_b")), on="id_b", how="left_anti")
        )
        relabeled = connected_components(surviving_edges).localCheckpoint(eager=True)
        singletons = (
            survivors.join(relabeled, on="doc_id", how="left_anti")
            .withColumn("cluster_id", F.col("doc_id"))
        )
        id_type = self.table.schema["cluster_id"].dataType
        assign_batch = (
            relabeled.unionByName(singletons)
            .withColumn("op", F.lit("U"))
            .unionByName(
                ids.withColumn("cluster_id", F.lit(None).cast(id_type))
                .withColumn("op", F.lit("D"))
            )
            .localCheckpoint(eager=True)
        )
        dead_edges = (
            all_edges.select("id_a", "id_b")
            .join(ids.select(F.col("doc_id").alias("id_a")), on="id_a", how="left_semi")
            .unionByName(
                all_edges.select("id_a", "id_b").join(
                    ids.select(F.col("doc_id").alias("id_b")),
                    on="id_b", how="left_semi",
                )
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        elsn = self.edges.current()["version"] + 1
        self._merge(
            self.edges,
            dead_edges.withColumn("lsn", F.lit(elsn).cast("long"))
            .withColumn("op", F.lit("D")),
            batch_id,
        )
        lsn = self.table.current()["version"] + 1
        self._merge(
            self.table,
            assign_batch.withColumn("lsn", F.lit(lsn).cast("long")),
            batch_id,
        )


class EmbeddingLSHIndex:
    """The embedding-side twin of MinHashIndex: a persisted banded
    sign-LSH index over vectors (simsearch.lsh_cosine_dedup_pairs is
    its one-shot form). Each batch computes band buckets + norms for
    ITS vectors only, finds candidate pairs against the stored index
    (same (band, bucket) collision rule), scores exact cosine on
    candidates, and MERGEs its rows in.

    The stored row carries the vector and its precomputed norm, so
    scoring a batch-vs-index candidate re-reads the index vector but
    never recomputes its norm or buckets — at 10^10 vectors those two
    map-side passes are the dominant per-batch cost the index
    amortizes away.

    Plane parameters are pinned at create() (sha256-derived planes →
    deterministic, oracle-reproducible): unlike the one-shot query,
    an incremental index cannot auto-resize planes as N grows without
    re-bucketing the corpus — pick planes for the TARGET corpus size
    up front (size_lsh_planes(expected_N)); that is the real
    operational contract of every production ANN index."""

    merge_strategy: str = "cow"
    mor_compact_threshold: int = 8

    def __init__(self, table: SnapshotTable, n_bands: int, planes_per_band: int,
                 n_dims: int):
        self.table = table
        self.n_bands = n_bands
        self.planes_per_band = planes_per_band
        self.n_dims = n_dims

    def _merge(self, batch: DataFrame, batch_id: str | None) -> CommitInfo:
        return _merged(self.table, batch, batch_id,
                       self.merge_strategy, self.mor_compact_threshold)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        location: str,
        n_bands: int = 4,
        planes_per_band: int = 4,
        n_dims: int = 64,
        num_buckets: int = 32,
    ) -> "EmbeddingLSHIndex":
        fields = [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("emb", T.ArrayType(T.DoubleType()), True),
            T.StructField("norm", T.DoubleType(), True),
        ] + [T.StructField(f"_b{i}", T.LongType(), True) for i in range(n_bands)]
        table = SnapshotTable.create(
            spark, location, T.StructType(fields),
            key_cols=["vec_id"], num_buckets=num_buckets,
        )
        table.evolve_schema(
            T.StructType(fields),
            change=(
                f"emblsh_params:n_bands={n_bands},"
                f"planes_per_band={planes_per_band},n_dims={n_dims}"
            ),
        )
        _write_index_params(
            location, "emblsh",
            {"n_bands": n_bands, "planes_per_band": planes_per_band,
             "n_dims": n_dims},
        )
        return cls(table, n_bands, planes_per_band, n_dims)

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "EmbeddingLSHIndex":
        table = SnapshotTable.load(spark, location)
        params = _read_index_params(location, "emblsh")
        if params is None:  # pre-sidecar index: recover from history
            params = {}
            for rec in table.history():
                change = str(rec.get("metrics", {}).get("schema_change", ""))
                if change.startswith("emblsh_params:"):
                    params = dict(
                        kv.split("=") for kv in change.split(":", 1)[1].split(",")
                    )
        if not params:
            raise ValueError(f"{location} is not an EmbeddingLSHIndex table")
        return cls(table, int(params["n_bands"]), int(params["planes_per_band"]),
                   int(params["n_dims"]))

    def doc_count(self) -> int:
        return self.table.snapshot().count()

    def remove_docs(self, ids: DataFrame, batch_id: str | None = None) -> None:
        """Retire vectors (same contract as MinHashIndex.remove_docs):
        tombstones their index rows so future batches stop matching
        against them."""
        lsn = self.table.current()["version"] + 1
        batch = (
            ids.select(F.col(ids.columns[0]).cast("long").alias("vec_id"))
            .withColumn("lsn", F.lit(lsn).cast("long"))
            .withColumn("op", F.lit("D"))
        )
        self._merge(batch, batch_id)

    def _sig_frame(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        from .simsearch import as_double, l2_norm, lsh_band_bucket

        return df.select(
            F.col(id_col).cast("long").alias("vec_id"),
            as_double(vec_col).alias("emb"),
            l2_norm(as_double(vec_col)).alias("norm"),
            *[
                lsh_band_bucket(vec_col, b, self.planes_per_band, self.n_dims)
                .alias(f"_b{b}")
                for b in range(self.n_bands)
            ],
        )

    def add_batch(
        self,
        vectors: DataFrame,
        batch_id: str | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.4,
    ) -> DataFrame:
        """Returns the new scored pairs (id_a < id_b, cosine ≥
        threshold) this batch completes, then merges the batch's
        rows into the index (exactly-once per batch_id)."""
        from .simsearch import _pair_cosine, dot

        sigs = self._sig_frame(vectors, id_col, vec_col)
        index = self.table.snapshot()
        # LWW view for scoring: a re-ingested vec_id uses the BATCH
        # vector (the merge will persist it); index rows for ids in
        # the batch are superseded.
        combined = sigs.unionByName(index.join(sigs, on="vec_id", how="left_anti"))

        def buckets(frame: DataFrame) -> DataFrame:
            stack = ", ".join(f"{i}, _b{i}" for i in range(self.n_bands))
            return frame.select(
                "vec_id", F.expr(f"stack({self.n_bands}, {stack}) AS (band, bucket)")
            )

        a, b = buckets(sigs).alias("a"), buckets(combined).alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            )
            .select(
                F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("id_a"),
                F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("id_b"),
            )
            .distinct()
        )
        vecs = combined.select("vec_id", "emb", "norm")
        pairs = (
            cand.join(
                vecs.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("va"),
                            F.col("norm").alias("na")),
                on="id_a",
            )
            .join(
                vecs.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("vb"),
                            F.col("norm").alias("nb")),
                on="id_b",
            )
            .withColumn(
                "cosine",
                F.round(
                    _pair_cosine(dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")),
                    4,
                ),
            )
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .localCheckpoint(eager=True)
        )
        lsn = self.table.current()["version"] + 1
        self._merge(
            sigs.withColumn("lsn", F.lit(lsn).cast("long")).withColumn("op", F.lit("U")),
            batch_id,
        )
        return pairs
