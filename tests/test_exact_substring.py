"""Exact-substring dedup (textops.duplicate_spans + cut_spans): the
Lee-et-al-style recipe — every cross-doc duplicated run >= span_len is
found exactly, merged into spans, and surgically removed."""

from __future__ import annotations

import pandas as pd

from datax_spark.textops import cut_spans, duplicate_spans

COMMON = "0123456789abcdefghij"  # 20 chars, planted in several docs


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def _spans(spark, rows, L=20, min_docs=2):
    df = duplicate_spans(_df(spark, rows), span_len=L, min_docs=min_docs)
    return {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in df.collect()
    }


def test_planted_duplicate_found_exactly(spark):
    rows = [
        (1, "AAA" + COMMON + "BBB"),
        (2, "xy" + COMMON + "z"),
        (3, "totally unrelated content here with no duplicate run"),
    ]
    got = _spans(spark, rows)
    assert got == {(1, 4, 23), (2, 3, 22)}


def test_adjacent_and_overlapping_runs_merge(spark):
    rows = [
        (1, COMMON + COMMON),      # duplicated run spans the whole doc
        (2, "pad " + COMMON + " pad " + COMMON),
    ]
    got = _spans(spark, rows)
    # doc 1 is one merged span covering everything; doc 2 two spans
    assert (1, 1, 40) in got
    # doc 2: "pad "(1-4) COMMON(5-24) " pad "(25-29) COMMON(30-49)
    assert (2, 5, 24) in got and (2, 30, 49) in got


def test_below_length_or_single_doc_ignored(spark):
    rows = [
        (1, "shared-short " + COMMON[:10]),
        (2, "other " + COMMON[:10]),          # only 10 shared chars < L
        (3, COMMON + " repeated only here " + COMMON[:0]),
    ]
    assert _spans(spark, rows, L=20) == set()


def test_cut_spans_surgery(spark):
    rows = [
        (1, "AAA" + COMMON + "BBB"),
        (2, "xy" + COMMON + "z"),
        (3, "untouched"),
        (4, COMMON),  # fully covered -> empty
        (5, COMMON + "tail" + COMMON),
    ]
    docs = _df(spark, rows)
    spans = duplicate_spans(docs, span_len=20, min_docs=2)
    got = {r["doc_id"]: r["cleaned"] for r in cut_spans(docs, spans).collect()}
    assert got[1] == "AAABBB"
    assert got[2] == "xyz"
    assert got[3] == "untouched"
    assert got[4] == ""
    assert got[5] == "tail"


def test_null_and_empty_text_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    spans = duplicate_spans(docs, span_len=20)
    assert spans.count() == 0
    got = {r["doc_id"]: r["cleaned"] for r in cut_spans(docs, spans).collect()}
    assert got == {1: "", 2: ""}


from hypothesis import given, settings, strategies as st


def _py_model(docs, L, min_docs=2):
    """Pure-Python reference: positions whose L-gram occurs in >=
    min_docs docs, merged into spans, then cut."""
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for did, text in docs:
        t = text or ""
        for i in range(len(t) - L + 1):
            gram_docs[t[i:i + L]].add(did)
    spans = {}
    for did, text in docs:
        t = text or ""
        marked = [i for i in range(len(t) - L + 1)
                  if len(gram_docs[t[i:i + L]]) >= min_docs]
        merged = []
        for p in marked:
            if merged and p <= merged[-1][1] - L + 1 + L:  # p <= prev_pos + L
                if p + L - 1 > merged[-1][1]:
                    merged[-1] = (merged[-1][0], p + L - 1)
            else:
                merged.append((p, p + L - 1))
        spans[did] = merged
    cleaned = {}
    for did, text in docs:
        t = text or ""
        out, prev = [], 0
        for s, e in spans[did]:
            out.append(t[prev:s])
            prev = e + 1
        out.append(t[prev:])
        cleaned[did] = "".join(out)
    return spans, cleaned


@st.composite
def _corpus(draw):
    # tiny alphabet + short docs so duplicated runs actually arise;
    # a shared motif is planted into a random subset
    motif = draw(st.text(alphabet="ab", min_size=8, max_size=14))
    docs = []
    for i in range(draw(st.integers(2, 5))):
        body = draw(st.text(alphabet="abc", min_size=0, max_size=25))
        if draw(st.booleans()):
            cut = draw(st.integers(0, len(body)))
            body = body[:cut] + motif + body[cut:]
        docs.append((i, body))
    return docs


@given(_corpus(), st.integers(4, 8))
@settings(max_examples=10, deadline=None)
def test_property_matches_python_model(spark, case, L):
    docs, = (case,)
    df = _df(spark, docs)
    spans_df = duplicate_spans(df, span_len=L, min_docs=2)
    got_spans = {}
    for r in spans_df.collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"] - 1, r["span_end"] - 1)  # model is 0-based
        )
    exp_spans, exp_cleaned = _py_model(docs, L)
    for did, _t in docs:
        assert sorted(got_spans.get(did, [])) == exp_spans[did], (did, L)
    got_cleaned = {
        r["doc_id"]: r["cleaned"] for r in cut_spans(df, spans_df).collect()
    }
    assert got_cleaned == exp_cleaned
