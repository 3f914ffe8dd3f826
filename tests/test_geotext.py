"""Geo x webtext fusion ops: hand-computed TF-IDF and entropy on a
tiny corpus, determinism of ranking, and plan shape (WindowGroupLimit
top-k, no Python eval)."""

import math

import pytest
from pyspark.sql import functions as F

from fgcspark.geotext import (
    cell_distinctive_terms,
    cell_lang_entropy,
    entity_cooccurrence,
    entity_range,
)

ROWS = [
    # cell A: 'lake' twice (only here), 'the' everywhere
    ("A", "the lake lake", "fi"),
    ("A", "the", "fi"),
    # cell B: 'bog' once, 'the' everywhere
    ("B", "the bog", "sv"),
    ("B", "the", "fi"),
    # cell C: 'fell fell fell'
    ("C", "fell fell fell the", "en"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "cell_50km string, text string, lang string")


def test_tfidf_hand_computed(df):
    out = cell_distinctive_terms(df, k=2)
    rows = {(r.cell, r.rank): r for r in out.collect()}
    nc = 3
    # 'lake' in cell A: tf=2, appears in 1 cell
    want_lake = round(2 * math.log((nc + 1) / (1 + 1)), 6)
    assert rows[("A", 1)].term == "lake"
    assert rows[("A", 1)].tf == 2
    assert rows[("A", 1)].score == pytest.approx(want_lake, abs=1e-9)
    # 'the' is in all 3 cells: idf = ln(4/4) = 0
    the_rows = [r for r in rows.values() if r.term == "the"]
    assert all(r.score == 0.0 for r in the_rows)
    # cell C rank 1 is 'fell' tf=3
    assert rows[("C", 1)].term == "fell" and rows[("C", 1)].tf == 3
    # k bound holds
    assert all(r.rank <= 2 for r in rows.values())


def test_tfidf_rank_ties_deterministic(spark):
    # two terms with identical (tf, cf) tie on score -> term asc breaks it
    d = spark.createDataFrame(
        [("X", "aa bb", "fi"), ("Y", "cc", "fi")],
        "cell_50km string, text string, lang string",
    )
    out = {(r.cell, r.rank): r.term for r in cell_distinctive_terms(d, k=2).collect()}
    assert out[("X", 1)] == "aa" and out[("X", 2)] == "bb"


def test_entropy_hand_computed(df):
    out = {r.cell: r for r in cell_lang_entropy(df).collect()}
    # A: 2 fi docs -> entropy 0; B: 1 sv + 1 fi -> ln 2; C: single doc -> 0
    assert out["A"].entropy == 0.0 and out["A"].n_langs == 1
    assert out["B"].entropy == pytest.approx(round(math.log(2), 6), abs=1e-9)
    assert out["B"].n_docs == 2 and out["B"].n_langs == 2
    assert out["C"].entropy == 0.0


ENT_ROWS = [
    # (url, e, n, cell, text) — species_01 in cells A,B; species_02 in B only
    ("u1", 100.0, 1000.0, "A", "doc species_01 observed"),
    ("u2", 300.0, 1200.0, "B", "doc species_01 observed"),
    ("u3", 200.0, 1100.0, "B", "doc species_02 twice species_02"),
    ("u4", 400.0, 1300.0, "C", "no mention here"),
]


@pytest.fixture(scope="module")
def edf(spark):
    return spark.createDataFrame(
        ENT_ROWS, "url string, e double, n double, cell_50km string, text string"
    )


def test_entity_range_hand_computed(edf):
    out = {r.entity: r for r in entity_range(edf).collect()}
    assert set(out) == {"species_01", "species_02"}
    s1 = out["species_01"]
    assert (s1.n_mentions, s1.n_cells) == (2, 2)
    assert (s1.min_e, s1.max_e, s1.min_n, s1.max_n) == (100.0, 300.0, 1000.0, 1200.0)
    s2 = out["species_02"]
    assert (s2.n_cells, s2.min_e) == (1, 200.0)


def test_entity_range_counts_mentions_per_row(edf):
    # n_mentions counts mention rows (a page mentioning an entity twice
    # contributes twice) — the documented explode semantics
    out = {r.entity: r.n_mentions for r in entity_range(edf).collect()}
    assert out["species_02"] == 2


def test_entity_cooccurrence(edf):
    rows = entity_cooccurrence(edf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.entity_a, r.entity_b, r.n_shared_cells) == (
        "species_01",
        "species_02",
        1,
    )


def test_entity_cooccurrence_salted_equals_plain(spark):
    """Property: the salted hot-cell path returns exactly the plain
    self-join's pairs. Random presence map with cells far above the
    cap, brute-forced in Python."""
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    presence = {}
    for cell in ("H1", "H2", "S1", "S2", "S3"):
        k = rng.randint(12, 30) if cell.startswith("H") else rng.randint(1, 4)
        ents = rng.sample(range(100), k)
        presence[cell] = {f"species_{e:02d}" for e in ents}
        for i, e in enumerate(ents):
            rows.append(
                (f"{cell}u{i}", 0.0, 0.0, cell, f"text species_{e:02d} end")
            )
    edf = spark.createDataFrame(
        rows, "url string, e double, n double, cell_50km string, text string"
    )
    want = {}
    for ents in presence.values():
        for a, b in itertools.combinations(sorted(ents), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r.entity_a, r.entity_b): r.n_shared_cells
        for r in entity_cooccurrence(edf, fanout_cap=4).collect()
    }
    assert got == want
    # cap >= every cell's k: pure cold path, same answer
    got_cold = {
        (r.entity_a, r.entity_b): r.n_shared_cells
        for r in entity_cooccurrence(edf, fanout_cap=1000).collect()
    }
    assert got_cold == want


def test_entity_cooccurrence_bounded_task_input(spark):
    """A 2000-entity hot cell must reach the pair join in key groups of
    ~fanout_cap rows per side, never k: no single join-key group may
    see a quadratic blow-up."""
    from pyspark.sql import functions as F

    cap = 100
    rows = [
        (f"u{i}", 0.0, 0.0, "HOT", f"x species_{i:04d} y") for i in range(2000)
    ]
    edf = spark.createDataFrame(
        rows, "url string, e double, n double, cell_50km string, text string"
    )
    # replicate the op's salted a-side keying and measure group sizes
    from fgcspark.geotext import entity_mentions

    pres = (
        entity_mentions(edf, r"species_\d+", "text", ("cell_50km",))
        .select("entity", F.col("cell_50km").alias("cell"))
        .distinct()
    )
    cnt = pres.groupBy("cell").agg(F.count(F.lit(1)).alias("_k"))
    hot = (
        pres.join(cnt, "cell")
        .where(F.col("_k") > cap)
        .withColumn("_s", F.ceil(F.col("_k") / F.lit(cap)).cast("int"))
        .withColumn("_b", F.pmod(F.xxhash64("entity"), F.col("_s")).cast("int"))
        .withColumn("_j", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)))
    )
    sizes = [
        r.n
        for r in hot.groupBy("cell", "_b", "_j")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) <= 3 * cap  # ~cap expected; 3x slack for hash skew
    # and the full operator still answers: every pair shares the 1 cell
    out = entity_cooccurrence(edf, fanout_cap=cap)
    assert out.where(F.col("n_shared_cells") != 1).count() == 0
    assert out.count() == 2000 * 1999 // 2


def test_plan_shape(df):
    plan = (
        cell_distinctive_terms(df, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
