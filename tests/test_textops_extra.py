"""token_percentiles: exact values vs an independent numpy
formulation, and the approx sketch variant's rank-accuracy bound."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fgcspark.textops import token_percentiles

TEXTS = [
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "a b c d e f g h i j k l m"),
    ("en", "hello, world! 123 -- this and that."),
    ("fi", "sataa ja tuulee koko paivan"),
    ("fi", "on kaunis kesapaiva tanaan taalla"),
]


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, schema="lang string, text string")


def test_token_percentiles_matches_numpy(spark):
    import re

    rng = np.random.default_rng(5)
    rows = [
        (TEXTS[i % len(TEXTS)][0], TEXTS[i % len(TEXTS)][1] * int(rng.integers(1, 9)))
        for i in range(200)
    ]
    got = (
        token_percentiles(_spark_df(spark, rows))
        .toPandas()
        .set_index("lang")
        .sort_index()
    )
    pat = re.compile(r"[a-z]+|[0-9]|[^a-z0-9 ]")
    df = pd.DataFrame(rows, columns=["lang", "text"])
    df["n"] = df["text"].map(lambda t: len(pat.findall(t)))
    for lang, grp in df.groupby("lang"):
        # numpy 'linear' interpolation == SQL percentile_cont definition
        want = np.percentile(grp["n"].to_numpy(), [50, 90, 99])
        assert np.allclose(got.loc[lang, ["p50", "p90", "p99"]].to_numpy(), want)


def test_token_percentiles_approx_within_rank_bound(spark):
    rows = [("en", "word " * (i + 1)) for i in range(500)]
    exact = token_percentiles(_spark_df(spark, rows)).toPandas().iloc[0]
    approx = (
        token_percentiles(_spark_df(spark, rows), approx=True).toPandas().iloc[0]
    )
    # sketch accuracy 1/10000 relative rank over 500 values -> exact
    # neighbors; allow one rank either side
    for p in ("p50", "p90", "p99"):
        assert abs(approx[p] - exact[p]) <= 3.0
    assert exact["p50"] <= exact["p90"] <= exact["p99"]


def test_pack_sequences_semantics(spark):
    from fgcspark.textops import pack_sequences

    rows = [
        # lang a: tokens 3, 3, 3 with budget 6 -> bins 1,1,2
        (1, "a b c", "aa"),
        (2, "d e f", "aa"),
        (3, "g h i", "aa"),
        # lang b: an oversized doc gets its own bin; packing continues
        (4, " ".join(["x"] * 10), "bb"),
        (5, "y z", "bb"),
        (6, "q r s t", "bb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # n_shards=1: a single stream per lang, so the exact greedy bin
    # assignments below are deterministic regardless of shard hashing
    out = {
        (r.lang, r.doc_id): (r.n_tokens, r.bin_id)
        for r in pack_sequences(df, budget=6, n_shards=1).collect()
    }
    assert out[("aa", 1)] == (3, 1)
    assert out[("aa", 2)] == (3, 1)
    assert out[("aa", 3)] == (3, 2)
    assert out[("bb", 4)][1] == 1  # oversized: own bin (first)
    assert out[("bb", 5)] == (2, 2)
    assert out[("bb", 6)] == (4, 2)


def test_pack_sequences_bins_never_overflow_except_oversized(spark):
    from fgcspark.textops import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=4096).toPandas()
    g = out.groupby(["lang", "shard", "bin_id"])["n_tokens"].agg(["sum", "count"])
    over = g[g["sum"] > 4096]
    # a bin may exceed the budget only when it holds a single oversized doc
    assert (over["count"] == 1).all()
    # ids within a stream are packed in order: bin ids are nondecreasing
    for _, grp in out.groupby(["lang", "shard"]):
        s = grp.sort_values("doc_id")["bin_id"]
        assert (s.diff().dropna() >= 0).all()


def test_pack_sequences_shards_bound_per_task_state(spark):
    """The scale contract: one applyInPandas task holds one
    (group, shard) stream, never a whole group. A single-language
    corpus with many docs must spread over all shards, every shard
    holding well under the whole group, and the shard assignment must
    be the deterministic md5-56 bucket (engine-independent)."""
    import hashlib

    from fgcspark.textops import pack_sequences

    n = 800
    rows = [(i, "w " * (1 + i % 7), "fi") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = pack_sequences(df, budget=64, n_shards=16).toPandas()
    assert len(out) == n
    sizes = out.groupby("shard")["doc_id"].count()
    assert len(sizes) == 16  # all shards populated at 800 docs
    assert sizes.max() < n / 4  # no shard holds anything near the group
    # shard is the md5-56 bucket of the id, bit-identical to the oracle
    for r in out.itertuples(index=False):
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:14], 16)
        assert r.shard == h % 16
    # per-stream packing matches an independent greedy re-derivation
    for (_, _), grp in out.groupby(["lang", "shard"]):
        grp = grp.sort_values("doc_id")
        b, acc, want = 0, 0, []
        for tok in grp["n_tokens"]:
            if b == 0 or acc + tok > 64:
                b, acc = b + 1, int(tok)
            else:
                acc += int(tok)
            want.append(b)
        assert grp["bin_id"].tolist() == want


def test_oov_rate_semantics(spark):
    from fgcspark.textops import oov_rate

    rows = [
        (1, "aa aa bb"),      # all tokens in a size-2 vocab {aa, bb}
        (2, "aa zz"),         # zz is OOV
        (3, "qq ww ee"),      # all OOV
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate) for r in oov_rate(df, vocab_size=2).collect()}
    assert out[1] == (3, 0, 0.0)
    assert out[2] == (2, 1, 0.5)
    assert out[3][1] == out[3][0]  # every token OOV
    # vocabulary tie-break is deterministic: counts aa=3, bb=1, zz=1,
    # qq=1, ww=1, ee=1 -> top-2 = {aa, bb} (count desc, token asc)
    assert out[2] == (2, 1, 0.5)


def test_repetition_signals(spark):
    from fgcspark.textops import repetition_signals

    rows = [
        (1, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> 3 dup of 5
        (2, "w x y z"),            # all distinct
        (3, "r r r r"),            # 2-grams: rr rr rr -> 2/3; 3-grams 1/2
        (4, "solo"),               # no n-grams at all -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].dup_2gram_frac == pytest.approx(3 / 5)
    assert out[2].dup_2gram_frac == 0.0 and out[2].dup_3gram_frac == 0.0
    assert out[3].dup_2gram_frac == pytest.approx(2 / 3)
    assert out[3].dup_3gram_frac == pytest.approx(1 / 2)
    assert out[4].dup_2gram_frac == 0.0 and out[4].n_words == 1


def test_repetition_plan_is_pure_codegen(spark):
    from fgcspark.textops import repetition_signals

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Generate" not in plan  # no explode


def test_top_tokens_per_group(spark):
    from fgcspark.textops import top_tokens_per_group

    rows = [
        (1, "a a a b b c", "x"),
        (2, "b c c", "x"),
        (3, "z z y", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = top_tokens_per_group(df, k=2).collect()
    by = {(r.lang, r.rank): (r.tok, r.n) for r in out}
    # lang x: a=3, b=3, c=3 -> ties broken token-asc: a then b
    assert by[("x", 1)] == ("a", 3)
    assert by[("x", 2)] == ("b", 3)
    assert by[("w", 1)] == ("z", 2)
    assert by[("w", 2)] == ("y", 1)
    # plan: rank filter pushes a partial top-k before the exchange
    plan = (
        top_tokens_per_group(df, k=2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_incremental_dedup_drops_only_corpus_duplicates(spark):
    from fgcspark.textops import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "Gamma  Delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta"),        # exact dup of corpus
            (11, "  GAMMA delta "),    # dup after normalization
            (12, "epsilon zeta"),      # fresh
            (13, "epsilon zeta"),      # within-batch dup: KEPT (not this op's job)
        ],
        "doc_id long, text string",
    )
    kept = incremental_dedup(batch, corpus)
    assert set(kept.columns) == {"doc_id", "text"}
    assert {r.doc_id for r in kept.collect()} == {12, 13}


def _WEAK_KEY(c):  # forces same-length collisions
    from pyspark.sql import functions as F

    return F.length(c).cast("long")


def test_exact_dedup_hash_group_with_collision_verify(spark):
    """Two DISTINCT texts forced into one hash bucket (weak injected
    key) must still come out as two keeper rows — the equality-verify
    pass over multi-member groups keeps the op exact, not
    probabilistic; true duplicate groups still collapse."""
    from fgcspark.textops import exact_dedup

    df = spark.createDataFrame(
        [
            (1, "aaaa"),  # collides with 'bbbb' on length
            (2, "bbbb"),
            (3, "aaaa"),  # true dup of 1
            (4, "unique longer text"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.keep_id, r.n_copies)
        for r in exact_dedup(df, key=_WEAK_KEY).collect()
    }
    assert got == {(1, 2), (2, 1), (4, 1)}
    # default key: same answer, and the corpus-wide exchange must
    # partition on the 8-byte fingerprint, never the text column
    plan = (
        exact_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(_fp" in plan
    assert "hashpartitioning(text" not in plan
    got_md5 = {(r.keep_id, r.n_copies) for r in exact_dedup(df).collect()}
    assert got_md5 == {(1, 2), (2, 1), (4, 1)}


def test_incremental_dedup_collision_survives(spark):
    """A new doc whose fingerprint collides with an UNRELATED corpus
    doc (weak injected key) must survive: fingerprint hits are verified
    by normalized-text equality before dropping."""
    from fgcspark.textops import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "aaaa bbbb")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "cccc dddd"),   # same length as corpus text: fp collides
            (11, "AAAA  bbbb"),  # true dup after normalization: dropped
            (12, "xyz"),         # no fp hit at all
        ],
        "doc_id long, text string",
    )
    kept = incremental_dedup(batch, corpus, key=_WEAK_KEY)
    assert {r.doc_id for r in kept.collect()} == {10, 12}


def test_line_dedup_threshold_and_order(spark):
    from fgcspark.textops import line_dedup

    mk = lambda i, lines: (i, "en", "\n".join(lines))
    df = spark.createDataFrame(
        [
            mk(1, ["BOILER", "unique one", "SHARED2"]),
            mk(2, ["BOILER", "unique two", "SHARED2"]),
            mk(3, ["BOILER", "unique three"]),
            mk(4, ["BOILER"]),  # all-boilerplate doc vanishes
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: r.clean_text
        for r in line_dedup(df, line_words=None, max_docs=2).collect()
    }
    # BOILER is in 4 > 2 docs -> stripped; SHARED2 in exactly 2 -> kept
    assert got == {
        1: "unique one\nSHARED2",
        2: "unique two\nSHARED2",
        3: "unique three",
    }


def test_line_dedup_word_window_chunking(spark):
    from fgcspark.textops import line_dedup

    # 3-word lines; the first line of every doc is identical boilerplate
    texts = [f"drop me now keep{i} mine {i}" for i in range(4)]
    df = spark.createDataFrame(
        [(i, "en", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: r.clean_text
        for r in line_dedup(df, line_words=3, max_docs=2).collect()
    }
    assert got == {i: f"keep{i} mine {i}" for i in range(4)}
