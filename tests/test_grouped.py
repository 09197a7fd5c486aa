"""applyInPandas (grouped-map) surface: whole-group kernels receive
each document complete, and the grouped-map formulation is pinned
row-for-row to the relational window form."""

from __future__ import annotations

import pandas as pd

from german_ocr_spark.operators.grouped import (
    renumber_grouped,
    renumber_relational,
)


def _spans(spark):
    rows = []
    # doc a: shuffled offsets incl. a tie broken by (kind, media_ref)
    rows += [
        ("a", 9, "text", "t3", "", 30),
        ("a", 0, "text", "t1", "", 10),
        ("a", 5, "image", "", "m/1", 20),
        ("a", 7, "text", "t2", "", 20),  # offset tie vs the image
    ]
    # doc b: single span
    rows += [("b", 4, "pdf", "p", "", 0)]
    # doc c: enough spans to span multiple Arrow batches if tiny
    rows += [("c", i, "text", f"x{i}", "", 1000 - i) for i in range(50)]
    return spark.createDataFrame(
        rows,
        "doc_id string, `order` int, kind string, text string, "
        "media_ref string, offset int",
    )


def test_grouped_map_matches_relational_window(spark):
    spans = _spans(spark).repartition(8)  # groups straddle partitions
    g = renumber_grouped(spans)
    r = renumber_relational(spans)
    assert g.exceptAll(r).isEmpty() and r.exceptAll(g).isEmpty()
    a = (
        g.filter("doc_id = 'a'")
        .orderBy("order")
        .select("order", "kind", "offset")
        .collect()
    )
    # offset tie at 20: 'image' sorts before 'text'
    assert [(x["order"], x.kind, x.offset) for x in a] == [
        (0, "text", 10), (1, "image", 20), (2, "text", 20), (3, "text", 30)
    ]
    c = g.filter("doc_id = 'c'").orderBy("order").select("offset").collect()
    assert [x.offset for x in c] == sorted(range(951, 1001))


def test_grouped_map_kernel_sees_whole_group(spark):
    """Each kernel invocation must receive ALL of a doc's spans — the
    property mapInPandas cannot guarantee. Orders are dense 0..n-1
    per doc, which only a whole-group kernel can emit."""
    spans = _spans(spark).repartition(16)
    g = renumber_grouped(spans).toPandas()
    for doc, grp in g.groupby("doc_id"):
        assert sorted(grp["order"]) == list(range(len(grp)))


def test_grouped_agg_udaf_matches_relational(spark):
    """The grouped-aggregate pandas_udf (Arrow UDAF surface) equals
    the pure-relational window formulation on skewed groups, tied
    values, and groups too small to trim."""
    from pyspark.sql import functions as F

    from german_ocr_spark.operators.grouped import (
        trimmed_mean_grouped,
        trimmed_mean_relational,
    )

    rows = (
        [("a", float(v)) for v in [1, 1, 1, 2, 3, 3, 50, 50, 900, 900, 900, 7]]
        + [("b", 5.0)]                       # singleton: no trimming
        + [("c", float(v)) for v in range(25)]
    )
    df = spark.createDataFrame(rows, "k string, v double").repartition(7)
    a = {r.k: r.trimmed_mean for r in trimmed_mean_grouped(df, "k", "v").collect()}
    b = {r.k: r.trimmed_mean
         for r in trimmed_mean_relational(df, "k", "v").collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12, k
    # group a: n=12, trim 1 from each end -> drop one 1 and one 900
    assert abs(a["a"] - (sum([1, 1, 2, 3, 3, 50, 50, 900, 900, 7]) / 10)) \
        < 1e-12
    assert a["b"] == 5.0


def test_trimmed_mean_null_nan_parity(spark):
    """Null/NaN rows are excluded by BOTH trimmed-mean forms under the
    same rule (pandas dropna vs relational pre-filter), and a group
    whose values are all null/NaN vanishes from both outputs — the
    divergence flagged in round-3 ADVICE (pandas sorts NaN last and
    skips it in sum() while counting it in len(); the window sorted
    nulls first and counted null rows)."""
    from pyspark.sql import functions as F

    from german_ocr_spark.operators.grouped import (
        trimmed_mean_grouped,
        trimmed_mean_relational,
    )

    nan = float("nan")
    rows = (
        # nulls/NaNs interleaved so trimming would drop DIFFERENT rows
        # if either form kept them
        [("a", v) for v in [None, nan, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0,
                            7.0, 8.0, 9.0, 10.0, None, nan]]
        + [("b", None), ("b", nan)]          # all-null group: no row
        + [("c", 2.0), ("c", None)]
    )
    df = spark.createDataFrame(rows, "k string, v double").repartition(5)
    a = {r.k: r.trimmed_mean for r in trimmed_mean_grouped(df, "k", "v").collect()}
    b = {r.k: r.trimmed_mean
         for r in trimmed_mean_relational(df, "k", "v").collect()}
    assert a.keys() == b.keys() == {"a", "c"}
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12, k
    # group a keeps exactly the 10 non-null values: n=10, trim 1 each end
    assert abs(a["a"] - (sum(range(2, 10)) / 8)) < 1e-12
    assert a["c"] == 2.0
