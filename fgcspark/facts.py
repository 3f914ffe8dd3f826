"""Facts pivot (S2/A1) + enrichment join (J1).

Reference semantics (R/finbif_geo_convert.R:83,641-653): keep a
whitelist of fact names from a long (Parent, Fact, Value) side table,
pivot one column per fact keyed by Parent, left-join onto the rows.

Distributed twist: the reference's first()-per-(Parent, Fact) is order
dependent; in Spark "first" is nondeterministic under shuffle, so the
engine defines the deterministic equivalent min_by(value, order_key) —
same result as the reference on its (stable-ordered, single-node)
inputs, stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_facts(
    facts: DataFrame,
    whitelist: list[str],
    parent_col: str = "Parent",
    fact_col: str = "Fact",
    value_col: str = "Value",
    order_col: str | None = None,
) -> DataFrame:
    """Long -> wide: one column per whitelisted fact name."""
    f = facts.filter(F.col(fact_col).isin(whitelist))
    agg: Column = (
        F.min_by(value_col, order_col) if order_col else F.first(value_col, ignorenulls=True)
    )
    return f.groupBy(parent_col).pivot(fact_col, whitelist).agg(agg)


def pivot_facts_typed(
    facts: DataFrame,
    schema: dict[str, str],
    parent_col: str = "Parent",
    fact_col: str = "Fact",
    order_col: str | None = None,
) -> DataFrame:
    """Typed long -> wide pivot. The archive's ``*_facts_*`` tables
    carry typed duplicates of every value (Value/IntValue/DecimalValue
    columns — SURVEY §1.2; reference fixture inst/tinytest/
    HBF.53254.zip) that the reference's whitelist path ignores; this
    surfaces each whitelisted fact from its natural typed column
    instead of the string form. `schema` maps fact name -> source
    value column ("Value" | "IntValue" | "DecimalValue").

    One shuffle: all referenced typed columns ride a single struct
    through one pivot aggregate (deterministic min_by, same semantics
    as pivot_facts), and the per-fact typed field is projected out
    afterwards — no per-type second aggregate, no self-join."""
    f = facts.filter(F.col(fact_col).isin(list(schema)))
    srcs = sorted(set(schema.values()))
    payload = F.struct(*[F.col(c) for c in srcs])
    agg: Column = (
        F.min_by(payload, order_col) if order_col else F.first(payload, ignorenulls=True)
    )
    wide = f.groupBy(parent_col).pivot(fact_col, list(schema)).agg(agg)
    return wide.select(
        parent_col,
        *[F.col(f"`{name}`.{src}").alias(name) for name, src in schema.items()],
    )


def join_facts(
    rows: DataFrame,
    facts: DataFrame,
    whitelist: list[str],
    row_key: str,
    parent_col: str = "Parent",
    fact_col: str = "Fact",
    value_col: str = "Value",
    order_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """J1 enrichment: join the pivoted facts (<= |whitelist| columns,
    one row per parent) onto the row table. broadcast=True (default)
    is zero-shuffle — right for event/document-level facts, which are
    orders of magnitude smaller than the rows; pass broadcast=False
    for record-level facts, which scale WITH the rows and need a
    shuffle hash join at 100 TB."""
    wide = pivot_facts(facts, whitelist, parent_col, fact_col, value_col, order_col)
    build = F.broadcast(wide) if broadcast else wide
    return rows.join(build, rows[row_key] == wide[parent_col], "left").drop(parent_col)
