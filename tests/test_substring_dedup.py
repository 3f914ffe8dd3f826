"""duplicate_spans (Lee-et-al substring dedup) and unigram_logprob
(CCNet-style LM quality score): hand-built corpora with known spans,
a brute-force python oracle, and plan-shape assertions."""

from __future__ import annotations

import math

import pytest

from fgcspark.textops import duplicate_spans, unigram_logprob


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_duplicate_spans_cross_doc(spark):
    # docs 1 and 2 share an 10-token run; doc 3 is unique
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{shared} one two three"),
        (2, f"x y z {shared}"),
        (3, "only unique words live here so nothing repeats at all ok"),
    ]
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(_docs(spark, rows), k=8).collect()
    }
    # shared run = 10 tokens -> 3 duplicated 8-gram anchors (pos 0..2 in
    # doc 1, pos 3..5 in doc 2), merged into ONE maximal span each
    assert got == {(1, 0, 9, 10), (2, 3, 12, 10)}


def test_duplicate_spans_within_doc_repeat(spark):
    block = "a b c d e f g h"
    rows = [(1, f"{block} q r s t u v w x {block}")]
    got = {
        (r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(_docs(spark, rows), k=8).collect()
    }
    # the 8-token block occurs twice within one doc -> both occurrences
    assert got == {(0, 7, 8), (16, 23, 8)}


def test_duplicate_spans_adjacent_anchor_merge(spark):
    # two dup 8-grams whose spans touch exactly (pos == prev + k) must
    # merge; separated ones (pos > prev + k) must not
    t1 = "p1 p2 p3 p4 p5 p6 p7 p8"
    t2 = "q1 q2 q3 q4 q5 q6 q7 q8"
    rows = [
        (1, f"{t1} {t2} gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9 {t1}"),
        (2, f"{t1} {t2}"),
        (3, f"{t2} mid {t1}"),
    ]
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(_docs(spark, rows), k=8).collect()
    )
    # doc 1: anchors at 0 (t1), 8 (t2) merge into [0,15]; anchor at 25
    # (t1 again) is its own span [25,32]
    assert (1, 0, 15) in got and (1, 25, 32) in got
    assert (2, 0, 15) in got
    # doc 3: t2 at 0 and t1 at 9 do NOT merge (gap token between)
    assert (3, 0, 7) in got and (3, 9, 16) in got


def test_duplicate_spans_no_dups_empty(spark):
    rows = [
        (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        (2, "v1 v2 v3 v4 v5 v6 v7 v8 v9"),
    ]
    assert duplicate_spans(_docs(spark, rows), k=8).count() == 0


def test_duplicate_spans_short_docs_skipped(spark):
    rows = [(1, "a b c"), (2, "a b c")]  # < k tokens: no anchors at all
    assert duplicate_spans(_docs(spark, rows), k=8).count() == 0


def test_unigram_logprob_matches_python(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the the the"),
        (3, "cat dog"),
    ]
    got = {
        r.doc_id: r.logprob
        for r in unigram_logprob(_docs(spark, rows)).collect()
    }
    counts = {"the": 4, "cat": 2, "sat": 1, "dog": 1}
    total = 8
    lp = {t: math.log(c) - math.log(total) for t, c in counts.items()}
    want = {
        1: (lp["the"] + lp["cat"] + lp["sat"]) / 3,
        2: lp["the"],
        3: (lp["cat"] + lp["dog"]) / 2,
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(round(v, 6), abs=1e-6)
    # the all-'the' doc is the most probable, the rare-word docs lower
    assert got[2] > got[1] and got[2] > got[3]


def test_unigram_logprob_plan_shape(spark):
    rows = [(i, "tok%d common" % (i % 5)) for i in range(50)]
    df = unigram_logprob(_docs(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no Python in the pipeline: pure JVM aggregation + joins
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # the 1-row corpus total must come back as a broadcast, never a
    # shuffle of the token table against a single row
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_duplicate_spans_plan_shape(spark):
    rows = [(i, " ".join("w%d" % j for j in range(12))) for i in range(20)]
    df = duplicate_spans(_docs(spark, rows), k=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_remove_duplicate_spans(spark):
    from fgcspark.textops import remove_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} keep1 keep2"),
        (2, f"pre1 pre2 {shared}"),
        (3, "totally unique text that repeats nothing else anywhere at all"),
        (4, shared),  # fully duplicated -> empty
        (5, "tiny doc"),  # < k tokens: untouched
    ]
    got = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_spans(_docs(spark, rows), k=8).collect()
    }
    assert got[1] == "keep1 keep2"
    assert got[2] == "pre1 pre2"
    assert got[3] == rows[2][1]  # byte-identical passthrough
    assert got[4] == ""
    assert got[5] == "tiny doc"
    assert len(got) == 5  # every doc kept, even when emptied
