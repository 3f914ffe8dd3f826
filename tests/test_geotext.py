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


def test_plan_shape(df):
    plan = (
        cell_distinctive_terms(df, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
