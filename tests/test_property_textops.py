"""Property-based checks: the Spark dedup/fingerprint operators must
agree with direct pure-Python models of their definitions on random
inputs (hypothesis drives the doc corpus)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from datax_spark import textops

WORDS = ["the", "cat", "merge", "lsn", "of", "zz", "batch", "a", "x1", "schema"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=6,
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def model_simhash(text: str, bits: int = 16) -> int:
    toks = text.split(" ")
    out = 0
    for i in range(bits):
        vote = 0
        for t in toks:
            vote += 1 if int(_sha(t)[i], 16) >= 8 else -1
        if vote > 0:
            out += 2 ** i
    return out


def model_minhash_pairs(texts: list[str], n_bands=4, k=8, stride=4) -> set[tuple[int, int]]:
    sigs = []
    for text in texts:
        sh = [text[s - 1: s - 1 + k] for s in range(1, max(len(text) - (k - 1), 1) + 1, stride)]
        hs = [_sha(g) for g in sh]
        sigs.append([min(h[b * 16: b * 16 + 16] for h in hs) for b in range(n_bands)])
    pairs = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if any(sigs[i][b] == sigs[j][b] for b in range(n_bands)):
                pairs.add((i, j))
    return pairs


def model_fingerprint(text: str) -> int:
    return sum(ord(ch) * 31 ** (i % 8) for i, ch in enumerate(text)) % textops.FP_MOD


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_simhash_matches_model(spark, docs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: r["sh"] for r in
           df.select("doc_id", textops.simhash("text").alias("sh")).collect()}
    for i, t in enumerate(docs):
        assert got[i] == model_simhash(t), (i, t)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_minhash_lsh_pairs_match_model(spark, docs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in textops.minhash_lsh_pairs(df).collect()}
    assert got == model_minhash_pairs(docs)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_fingerprint_matches_model(spark, docs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", textops.doc_fingerprint("text").alias("fp")).collect()}
    for i, t in enumerate(docs):
        assert got[i] == model_fingerprint(t), (i, t)


def test_jaccard_df_cap_bounds_fanout(spark):
    """Adversarial common-token corpus: every doc shares one stopword-
    grade token, so the uncapped explode-join emits ~n² rows for that
    token alone. With max_df, the candidate-token table drops it
    entirely (bounded join fan-out) while distinctive tokens survive,
    and near-dup pairs are still found."""
    from pyspark.sql import functions as F

    n = 40
    docs = [(i, f"common uniq{i} uniq{i}b") for i in range(n)]
    docs[1] = (1, "common uniq0 uniq0b")  # near-dup of doc 0
    df = spark.createDataFrame(docs, "doc_id long, text string")

    ex_uncapped = textops.jaccard_candidate_tokens(df, max_df=None)
    ex_capped = textops.jaccard_candidate_tokens(df, max_df=5)
    # 'common' (df = n) is gone; per-token fan-out now bounded by max_df
    assert ex_uncapped.filter(F.col("t") == "common").count() == n
    assert ex_capped.filter(F.col("t") == "common").count() == 0
    per_tok = ex_capped.groupBy("t").count().agg(F.max("count")).collect()[0][0]
    assert per_tok <= 5
    # the true near-dup pair survives the cap: docs 0/1 share uniq0,
    # uniq0b (df=2 each) → intersection 2 of union 4... plus 'common'
    # dropped from BOTH the intersection; n_tok stays full (3), so
    # jaccard = 2/(3+3-2) = 0.5
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in textops.jaccard_pairs(df, threshold=0.5, max_df=5).collect()}
    assert pairs == {(0, 1): 0.5}


def test_jaccard_capped_equals_uncapped_when_df_below_cap(spark):
    """With the cap above every token's actual df, results are
    IDENTICAL to the uncapped operator (the production default keeps
    the driver oracle exact)."""
    docs = [(i, f"alpha beta w{i % 3} w{i % 5}") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_capped = sorted(map(tuple, textops.jaccard_pairs(df, threshold=0.3, max_df=1000).collect()))
    got_plain = sorted(map(tuple, textops.jaccard_pairs(df, threshold=0.3, max_df=None).collect()))
    assert got_capped == got_plain and len(got_capped) > 0


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_word_occurrences_matches_token_membership_model(spark, docs):
    """The codegen regexp_count rewrite of stopword/marker counting
    must equal the definitional model — count of split-on-space tokens
    exactly equal to a vocab word — on random corpora, including docs
    that are entirely stopwords or contain repeated/adjacent matches
    (the lookaround-delimiter edge case)."""
    from pyspark.sql import functions as F

    vocab = ["the", "of", "a", "x1"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", textops.word_occurrences("text", vocab).alias("n")
        ).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == sum(1 for t in text.split(" ") if t in vocab), (i, text)


# ---- stratified mix + decontamination ---------------------------------


def test_sample_stratified_deterministic_and_monotone(spark):
    """Same salt → identical keep set across runs; raising one
    stratum's rate only ADDS members to it and never touches others."""
    rows = [(i, ["en", "fr", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def keep(rates, default=0.0):
        out = textops.sample_stratified(
            df, rates, strata_col="lang", id_col="doc_id", default_rate=default
        )
        return {(r["doc_id"], r["lang"]) for r in out.collect()}

    a = keep({"en": 0.5, "fr": 0.2})
    assert a == keep({"en": 0.5, "fr": 0.2})  # deterministic
    assert all(lang != "zh" for _, lang in a)  # default_rate=0 drops zh
    b = keep({"en": 0.9, "fr": 0.2})
    assert {x for x in a if x[1] == "en"} <= {x for x in b if x[1] == "en"}
    assert {x for x in a if x[1] == "fr"} == {x for x in b if x[1] == "fr"}
    full = keep({}, default=1.0)
    assert len(full) == 300  # rate 1.0 keeps everything


def test_word_ngrams_and_decontaminate(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # shares "a b c" + "b c d" with bench
            (2, "x y z w"),          # disjoint
            (3, "z a b c z"),        # shares "a b c" only
            (4, "a b"),              # too short for trigrams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "q a b c d q")], "doc_id long, text string"
    )
    scores = {
        r["doc_id"]: r["n_shared"]
        for r in textops.contamination_scores(docs, bench, n=3).collect()
    }
    assert scores == {1: 2, 3: 1}  # doc1 shares "a b c" + "b c d"
    clean = textops.decontaminate(docs, bench, n=3)
    assert {r["doc_id"] for r in clean.collect()} == {2, 4}
