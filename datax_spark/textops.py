"""Text-analysis + deduplication operators for training-data pipelines.

The reference engine moves records; a modern large-scale ingest
pipeline must also *curate* them. These operators extend the engine
beyond the reference's transformer set (SURVEY.md §2.3) with the
standard corpus-curation suite: exact dedup, MinHash-LSH near-dedup,
SimHash, n-gram Jaccard, language ID, quality scoring, token counting
and document fingerprinting.

Design rules (the same ones as the engine core):
  * everything is a Catalyst column expression or a built-in
    explode/groupBy — JVM-side, whole-stage-codegen, no Python in the
    hot path;
  * every operator is oracle-checkable: the hash primitive is sha2/
    sha256 (identical in Spark and DuckDB), never Spark's murmur3
    `hash()` (engine-specific);
  * shuffles are explicit and minimal: dedup = one groupBy on the
    fingerprint; LSH = one explode + one groupBy per band + one
    self-join on bucket.

At 100 TB these all scale linearly: fingerprints/signatures are
computed map-side; the only shuffles are keyed by hash values, which
are uniform by construction (no skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------------------ basics

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "le", "la", "der", "el"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization — array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_token_estimate(n_chars: str | Column) -> Column:
    """BPE-ish token-count estimate: ~4 chars/token (ceil)."""
    c = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    return F.ceil(c / F.lit(4.0)).cast("long")


def _word_count_pattern(words: list[str]) -> str:
    """Regex counting tokens exactly equal to one of `words` in a
    single-space-delimited string wrapped in sentinel spaces:
    zero-width lookarounds keep adjacent matches from consuming each
    other's delimiter. Exactly equivalent to filtering the split-on-
    space token array for membership (all words are alphanumeric, no
    escaping needed)."""
    return "(?<= )(" + "|".join(words) + ")(?= )"


def word_occurrences(col: str | Column, words: list[str]) -> Column:
    """Count tokens equal to any of `words` — ONE regexp_count pass,
    whole-stage codegen. The equivalent array HOF
    (size(filter(tokens, array_contains))) evaluates its lambda
    INTERPRETED per element; measured on this VM the regex form is a
    modest ~10-20% faster at 160k docs (1.0 → 0.9 s for 5 marker-set
    counts) — the split+filter cost is alloc-dominated, not
    interpreter-dominated — and it avoids materializing the token
    array entirely. Identical token-equality semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(
        F.concat(F.lit(" "), c, F.lit(" ")), F.lit(_word_count_pattern(words))
    )


def stopword_count(col: str | Column, stopwords: list[str] | None = None) -> Column:
    """Count of stopword tokens — codegen regexp_count, no explode,
    no shuffle (see word_occurrences)."""
    return word_occurrences(col, stopwords or STOPWORDS)


def quality_score(text_col: str | Column) -> Column:
    """Heuristic doc-quality score in [0,1]: rewards reasonable length
    and a natural-language-like stopword ratio. Same closed form as
    the DuckDB oracle (queries.py)."""
    n_tok = token_count(text_col).cast("double")
    sw_ratio = stopword_count(text_col).cast("double") / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = F.lit(1.0) - F.abs(sw_ratio - F.lit(0.2)) / F.lit(0.8)
    return F.round(F.lit(0.5) * len_score + F.lit(0.5) * sw_score, 4)


# -------------------------------------------------- normalization / PII

# Shared regex source for Spark (Java regex) and the DuckDB oracle
# (RE2) — both dialects support these constructs identically.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def normalize_text(col: str | Column) -> Column:
    """Canonical whitespace + case fold — the first stage of every
    dedup pipeline (exact dedup over raw bytes misses trivial
    formatting variants). Pure column expressions."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def redact_pii(col: str | Column) -> Column:
    """Training-data PII scrub: emails → <EMAIL>, IPv4 → <IP>.
    regexp_replace is JVM-side and replaces all occurrences; patterns
    are engine-portable (EMAIL_RE/IP_RE shared with the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
    )


# ------------------------------------------------------------- language ID

# Per-language marker words (n-gram heuristic, unigram order). A doc's
# guessed language = argmax marker-hit count, ties → 'en' < 'de' < ...
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "que", "es", "por"],
}


def lang_marker_count(text_col: str | Column, lang: str) -> Column:
    return word_occurrences(text_col, LANG_MARKERS[lang])


def lang_id(text_col: str | Column) -> Column:
    """argmax over LANG_MARKERS counts; all-zero → 'unk'. Deterministic
    tie-break: first language in sorted(LANG_MARKERS) order wins."""
    scored = None
    best_cnt = None
    for lang in sorted(LANG_MARKERS):
        cnt = lang_marker_count(text_col, lang)
        if scored is None:
            scored, best_cnt = F.lit(lang), cnt
        else:
            scored = F.when(cnt > best_cnt, F.lit(lang)).otherwise(scored)
            best_cnt = F.when(cnt > best_cnt, cnt).otherwise(best_cnt)
    return F.when(best_cnt > 0, scored).otherwise(F.lit("unk"))


# --------------------------------------------------------- fingerprinting

FP_MOD = 1_000_000_007


def doc_fingerprint(text_col: str | Column) -> Column:
    """Rolling polynomial fingerprint over characters:
    sum(ascii(ch) * 31^(pos mod 8)) mod 1e9+7.

    Weights cycle with period 8 so every term fits int64
    (255 * 31^7 ≈ 7e12; x 1e4 chars ≈ 7e16 < 2^63). Pure int
    arithmetic → bit-identical in any engine.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    chars = F.split(c, "")
    weighted = F.transform(
        chars,
        lambda ch, i: F.ascii(ch).cast("long")
        * F.pow(F.lit(31.0), (i % F.lit(8)).cast("double")).cast("long"),
    )
    return (
        F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x) % F.lit(FP_MOD)
    )


def content_hash(col: str | Column) -> Column:
    """Exact-dedup key: sha256 of the raw text (driver-oracle-stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one hash-groupBy on sha256(text). Returns one row
    per distinct content: (content_sha, keep_id = min id, n_copies).
    Map-side partial agg; shuffle key is uniform → no skew at 100 TB.
    """
    return (
        df.select(content_hash(text_col).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ----------------------------------------------- splits / chunking

def hash_split_bucket(id_col: str | Column, n_buckets: int = 10_000,
                      salt: str = "split") -> Column:
    """Deterministic, engine-portable split bucket in [0, n_buckets):
    the first 8 hex nibbles of sha256(salt:id) as a base-16 integer,
    mod n_buckets. This is how a training pipeline assigns train/val/
    test membership REPRODUCIBLY at any scale — no RNG, no sampling
    seed drift across engines or re-runs, and a row's split never
    changes when the corpus grows (unlike randomSplit, which
    reshuffles everything on every new snapshot). sha256 keeps the
    assignment uniform and the DuckDB oracle bit-identical."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.sha2(F.concat(F.lit(salt + ":"), c.cast("string")), 256)
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/... by cumulative weight
    over the hash bucket). Map-side only — no shuffle, no RNG."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    n = 10_000
    bucket = hash_split_bucket(id_col, n, salt)
    expr: Column | None = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cond = bucket < int(round(acc * n))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(list(weights)[-1])))


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Training-mix construction: downsample each stratum (language /
    domain / source) to its configured keep-rate, deterministically —
    the data-mixing stage of an LM corpus build (keep all of en, 30%
    of crawl, 5% of logs, ...). Same sha-bucket machinery as
    hash_split: membership is reproducible across engines and re-runs,
    stable as the corpus grows (randomSplit is neither), and decided
    map-side per row — no shuffle, no RNG state. A row's bucket
    depends only on (salt, id), so changing one stratum's rate never
    resamples the others."""
    n = 10_000
    bucket = hash_split_bucket(id_col, n, salt)
    thresh: Column | None = None
    for k, r in rates.items():
        t = F.lit(int(round(r * n)))
        cond = F.col(strata_col) == k
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default = F.lit(int(round(default_rate * n)))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(bucket < thresh)


def word_ngrams(col: str | Column, n: int = 5) -> Column:
    """Distinct word n-grams (n consecutive whitespace tokens joined
    by one space) as array<string>; empty when the document has fewer
    than n tokens. Pure array built-ins — map-side, no explode here
    (callers explode only where they need one row per gram)."""
    tok = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - n + 1),
        lambda i: F.array_join(F.slice(tok, i, n), " "),
    )
    empty = F.expr("cast(array() as array<string>)")
    return F.when(F.size(tok) >= n, F.array_distinct(grams)).otherwise(empty)


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (training-data hygiene): per
    candidate document, the number of distinct word n-grams it shares
    with a benchmark/eval corpus — the standard n-gram-overlap
    contamination test run before training so eval questions don't
    leak into the training set. Scale shape: eval sets are tiny, so
    the benchmark's distinct n-gram set BROADCASTS; the corpus side
    explodes map-side into the broadcast hash join, and the only
    shuffle is the final per-doc count. Returns (doc_id, n_shared),
    contaminated docs only."""
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("ng"),
    )
    bg = benchmark.select(F.explode(word_ngrams(text_col, n)).alias("ng")).distinct()
    return (
        g.join(F.broadcast(bg), on="ng")
        # per-doc grams are already distinct (word_ngrams dedups), so
        # each match is one distinct shared gram
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents sharing >= min_shared distinct word n-grams with
    the benchmark corpus (anti-join against contamination_scores)."""
    hits = contamination_scores(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col
    ).filter(F.col("n_shared") >= min_shared)
    return docs.join(
        hits.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_anti"
    )


def chunk_token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping token windows — the chunking
    stage in front of every embedding/RAG pipeline. Chunk starts are
    1, 1+stride, … while the PREVIOUS chunk did not already reach the
    end of the document (so the tail is always covered and no chunk is
    fully contained in its predecessor); the last chunk may be short.
    Pure array built-ins (sequence → filter → slice), exploded to one
    row per chunk with a per-chunk sha — no Python, no shuffle."""
    tok = tokens(text_col)
    n = F.size(tok)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        # keep a start iff it is the first chunk or the previous
        # chunk's last token (start - stride + window - 1) fell short
        # of the document end
        lambda s: (s == F.lit(1)) | (s - stride + window - 1 < n),
    )
    base = df.select(
        F.col(id_col), F.col(text_col).alias("_text"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.split(F.col("_text"), " "), F.col("start"), window)
    return base.select(
        id_col, "chunk_idx", "start",
        F.size(chunk).alias("chunk_tokens"),
        F.sha2(F.array_join(chunk, " "), 256).alias("chunk_sha"),
    )


# ------------------------------------------------------------ MinHash-LSH

def duplicate_spans(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    span_len: int = 40, min_docs: int = 2,
) -> DataFrame:
    """EXACT duplicated-substring detection (the Lee et al. 2022
    'Deduplicating Training Data Makes Language Models Better' exact-
    substring recipe, re-expressed over hashes instead of a suffix
    array): every duplicated run of ≥ span_len characters appearing in
    ≥ min_docs documents is returned as merged per-document spans
    (doc_id, span_start, span_end), 1-based inclusive.

    Exactness argument: a cross-doc duplicated run of length ≥ L
    contains a duplicated L-gram at EVERY offset, so hashing the
    L-gram at every position and keeping positions whose hash occurs
    in ≥ min_docs docs marks exactly the duplicated runs (sha256
    12-hex prefix — collision odds negligible); consecutive marked
    positions ≤ L apart merge into one span (gaps-and-islands).

    Cost shape, stated honestly: one row PER CHARACTER of corpus
    (explode) with one sha256 each, then one hash-keyed count shuffle
    with map-side partial agg and one doc-keyed window — O(bytes)
    rows, the same asymptotic bill the published suffix-array
    implementations pay (they sort the bytes). Production levers: run
    it AFTER the cheap dedups shrink the corpus, and/or raise
    span_len."""
    from pyspark.sql import Window

    c = F.coalesce(F.col(text_col), F.lit(""))
    did = F.col(id_col)
    L = span_len
    n = F.length(c) - F.lit(L - 1)
    grams = (
        docs.select(did.alias("doc_id"), c.alias("_c"), n.alias("_n"))
        .filter(F.col("_n") >= 1)
        .select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(1), F.col("_n"))).alias("_i", "pos"),
            F.col("_c"),
        )
        .select(
            "doc_id", "pos",
            F.substring(
                F.sha2(F.col("_c").substr(F.col("pos"), F.lit(L)), 256), 1, 12
            ).alias("_h"),
        )
    )
    dup = (
        grams.groupBy("_h")
        .agg(F.count_distinct(F.col("doc_id")).alias("_dd"))
        .filter(F.col("_dd") >= min_docs)
        .select("_h")
    )
    marked = grams.join(dup, "_h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos", 1, -(10**9)).over(w) > L, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        marked.withColumn("_brk", brk)
        .withColumn("_island", F.sum("_brk").over(w))
        .groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def cut_spans(
    docs: DataFrame, spans: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove the given character spans from each document — the
    surgery half of exact-substring dedup. Returns (doc_id, cleaned):
    docs without spans pass through whole; a fully-covered doc yields
    ''. Kept SEGMENTS are materialized as rows (window lag over span
    starts gives each segment's bounds, plus the per-doc tail), then
    reassembled in order — every substring is computed exactly once
    and both engines express it identically."""
    from pyspark.sql import Window

    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("_c"))
    w = Window.partitionBy("doc_id").orderBy("span_start")
    mid = (
        d.join(spans, "doc_id")
        .select(
            "doc_id", "_c",
            (F.coalesce(F.lag("span_end", 1).over(w), F.lit(0)) + 1).alias("_ks"),
            (F.col("span_start") - 1).alias("_ke"),
        )
    )
    tail = (
        d.join(spans, "doc_id", "left")
        .groupBy("doc_id", "_c")
        .agg((F.coalesce(F.max("span_end"), F.lit(0)) + 1).alias("_ks"))
        .select("doc_id", "_c", "_ks", F.length("_c").alias("_ke"))
    )
    kept = (
        mid.unionByName(tail)
        .filter(F.col("_ke") >= F.col("_ks"))
        .select(
            "doc_id", "_ks",
            F.col("_c").substr(
                F.col("_ks"), F.col("_ke") - F.col("_ks") + F.lit(1)
            ).alias("_seg"),
        )
    )
    glued = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ks", "_seg"))),
                lambda x: x["_seg"],
            ),
            "",
        ).alias("cleaned")
    )
    return (
        d.join(glued, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"))
    )


def char_shingles(text_col: str | Column, k: int = 8, stride: int = 4) -> Column:
    """Character k-gram shingles at the given stride — array<string>.
    transform() over a sequence of start offsets; no explode yet."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    starts = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(k - 1), F.lit(1)), F.lit(stride))
    return F.transform(starts, lambda s: F.substring(c, s, k))


def minhash_signature(text_col: str | Column, n_hashes: int = 4, k: int = 8,
                      stride: int = 4) -> Column:
    """MinHash signature: array of n_hashes values; hash_i(doc) =
    min over shingles of hex digits [16i, 16i+16) of sha2(shingle).
    ONE sha256 per shingle — the n_hashes 64-bit band hashes are
    disjoint substrings of it (independent enough for LSH banding,
    and n_hashes× cheaper than hashing each shingle per band).
    Lexicographic min of hex strings ≡ numeric min; identical across
    engines. n_hashes ≤ 4 (4 × 16 hex digits = one sha256)."""
    if n_hashes > 4:
        raise ValueError("n_hashes > 4 needs a second hash round")
    sh = char_shingles(text_col, k=k, stride=stride)
    hashed = F.transform(sh, lambda s: F.sha2(s, 256))
    sig = [
        F.array_min(F.transform(hashed, lambda h: F.substring(h, i * 16 + 1, 16)))
        for i in range(n_hashes)
    ]
    return F.array(*sig)


def minhash_band_minima(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Per-document MinHash band minima: (id, _b0.._b{n-1}), band i's
    value = min over shingles of hex digits [16i, 16i+16) of
    sha2(shingle). The signature stage shared by the one-shot pair
    query (minhash_lsh_pairs) and the incremental index
    (dedup_index.MinHashIndex) — identical signatures by construction
    is what makes incremental == full-recompute provable.

    Signature via explode + groupBy, NOT the array-HOF form
    (minhash_signature): higher-order functions evaluate their lambda
    interpreted per element, while the exploded form keeps sha256 and
    substring inside whole-stage codegen — ~3× faster at corpus
    scale. Semantics identical (same shingles, same per-band min)."""
    starts = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(F.col("_t")) - F.lit(k - 1), F.lit(1)),
            F.lit(stride),
        )
    ).alias("_s")
    hashed = (
        df.select(F.col(id_col), F.col(text_col).alias("_t"))
        .select(id_col, "_t", starts)
        .select(id_col, F.sha2(F.expr(f"substring(_t, _s, {k})"), 256).alias("h"))
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(F.substring("h", i * 16 + 1, 16)).alias(f"_b{i}") for i in range(n_bands)]
    )


def band_buckets(per_doc: DataFrame, id_col: str = "doc_id", n_bands: int = 4) -> DataFrame:
    """(id, _b0.._b{n-1}) → exploded (id, band, bucket) rows — the LSH
    join key frame."""
    stack = ", ".join(f"{i}, _b{i}" for i in range(n_bands))
    return per_doc.select(
        F.col(id_col),
        F.expr(f"stack({n_bands}, {stack}) AS (band, bucket)"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 8,
    stride: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ANY band's minhash bucket.
    One row per (band, bucket) collision pair, deduped to (id_a, id_b).

    Plan shape: map-side signature compute → explode to n_bands rows →
    ONE shuffle on (band, bucket) via self-join → distinct pairs.
    Bucket keys are 256-bit hashes → uniform, skew-free.
    """
    per_doc = minhash_band_minima(
        df, text_col=text_col, id_col=id_col, n_bands=n_bands, k=k, stride=stride
    )
    sig = band_buckets(per_doc, id_col=id_col, n_bands=n_bands)
    # Pair enumeration via groupBy + in-bucket cross of the collected
    # id list, NOT a self-join: a self-join would recompute the whole
    # shingle+minhash pipeline for both sides. One shuffle on
    # (band, bucket); bucket membership lists are small by construction
    # (only near-identical docs collide), so collect_list is bounded.
    buckets = sig.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ids")
    ).filter(F.size("ids") > 1)
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda a, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


# ---------------------------------------------------------------- SimHash

SIMHASH_BITS = 16
_HEXPOS = "0123456789abcdef"


def simhash(text_col: str | Column, bits: int = SIMHASH_BITS) -> Column:
    """bits-bit SimHash over whitespace tokens.

    Per token, bit i's vote comes from hex digit i of sha256(token):
    nibble ≥ 8 → +1 else −1; the doc's bit i is 1 iff the summed vote
    is > 0. All closed-form int arithmetic — oracle-identical.

    Single pass over the token array: one aggregate() folds every
    token's bits-wide vote vector into an accumulator via zip_with
    (the naive form — one aggregate per bit — rescans the sha array
    `bits` times and was ~3× slower at 5k docs).
    """
    tok = tokens(text_col)
    h = F.transform(tok, lambda t: F.sha2(t, 256))
    positions = F.sequence(F.lit(1), F.lit(bits))

    def votes(x: Column) -> Column:
        return F.transform(
            positions,
            lambda i: F.when(
                F.instr(F.lit(_HEXPOS), F.substr(x, i, F.lit(1))) - F.lit(1) >= 8,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        )

    acc = F.aggregate(
        h,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda a, x: F.zip_with(a, votes(x), lambda u, v: u + v),
    )
    weighted = F.zip_with(
        acc,
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda v, i: F.when(
            v > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)


# -------------------------------------------------------- n-gram Jaccard

def jaccard_candidate_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exploded (id, group…, n_tok, token) rows feeding the Jaccard
    self-join, with an optional document-frequency cap: tokens present
    in more than max_df docs of a block are DROPPED before the join
    (positional-filtering trick). One token shared by n docs emits n²
    join rows, so a stopword-grade token inside a big block is a
    quadratic blowup; the cap bounds the fan-out of any single token
    to max_df² at the cost of undercounting intersections for pairs
    whose only overlap is ubiquitous tokens (which Jaccard would
    score near 0 anyway). n_tok stays the FULL token count, so scores
    of surviving pairs are exact unless a dropped token was shared."""
    group_cols = group_cols or []
    base = df.select(
        F.col(id_col), *group_cols, F.array_distinct(tokens(text_col)).alias("tok")
    ).withColumn("n_tok", F.size("tok"))
    ex = base.select(id_col, *group_cols, "n_tok", F.explode("tok").alias("t"))
    if max_df is not None:
        allowed = (
            ex.groupBy(*group_cols, "t")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select(*group_cols, "t")
        )
        ex = ex.join(allowed, on=[*group_cols, "t"], how="left_semi")
    return ex


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    threshold: float = 0.5,
    max_df: int | None = 100_000,
) -> DataFrame:
    """Word-set Jaccard similarity for candidate pairs within the same
    group (blocking keys bound the pair explosion — at 100 TB you
    never all-pairs; group_cols or an LSH bucket supplies candidates),
    with a document-frequency cap bounding per-token join fan-out
    (see jaccard_candidate_tokens; max_df=None disables).

    |A∩B| via explode-distinct-token join + count; |A∪B| = |A|+|B|−∩.
    """
    group_cols = group_cols or []
    ex = jaccard_candidate_tokens(
        df, text_col=text_col, id_col=id_col, group_cols=group_cols, max_df=max_df
    )
    a, b = ex.alias("a"), ex.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (F.col("a.t") == F.col("b.t"))
    for g in group_cols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_tok").alias("na"),
            F.col("b.n_tok").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
