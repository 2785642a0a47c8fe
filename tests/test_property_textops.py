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
