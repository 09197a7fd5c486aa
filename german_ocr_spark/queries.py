"""Driver-contract query registry (SURVEY §2 Part B + training-data ops).

Every entry exists twice: a Spark DataFrame program (idiomatic —
declarative plans, broadcast hints, window specs, built-in functions
only in the hot path) and a DuckDB ANSI-SQL oracle producing the exact
same rows. Column names are aliased identically on both sides; float
aggregation goes through exact DECIMAL arithmetic or floor-rounding so
the driver's value-hash comparison is bitwise-stable.

Conventions for cross-engine determinism:
- money sums: cast to DECIMAL(18,4) BEFORE aggregating (exact, order-
  independent on both engines), cast the final sum to double;
- ratios: floor(x*1e6)/1e6 (round() differs: HALF_UP vs HALF_EVEN);
- top-k: rank keys always include a unique integer tiebreak;
- hashes: md5 hex (identical everywhere); hex→int via conv/0x-cast.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import german, textstats

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col_name: str):
    return F.col(col_name).cast("decimal(18,4)")


def _floor6(c):
    return F.floor(c * 1000000.0) / 1000000.0


def _floor6_sql(e: str) -> str:
    return f"(floor(({e}) * 1000000.0) / 1000000.0)"


# =====================================================================
# Relational core (SURVEY B3/B4/B9-B13) over the TPC-H-ish tables
# =====================================================================

@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           (floor(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(*) * 1000000.0) / 1000000.0) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            _floor6(
                F.sum(_dec("l_quantity")).cast("double") / F.count("*")
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_top_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q02(spark, sf_dir):
    # customer is the small dimension: broadcast it (no shuffle of the
    # fact side on the build key at 100 TB).
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q03_region_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('EUROPE', 'ASIA')
    GROUP BY n.n_name
    """,
)
def q03(spark, sf_dir):
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("EUROPE", "ASIA"))
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # dim chain region->nation->customer is tiny: broadcast the whole
    # reduced customer dim into the fact joins.
    dim = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q04_priority_discounted",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
)
def q04(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q05_orders_no_lineitem",
    """
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    GROUP BY o_orderstatus
    """,
)
def q05(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q06_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def q06(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q07_running_user_value",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS run_value
    FROM events
    """,
)
def q07(spark, sf_dir):
    # running sum goes through DECIMAL: exact, so the prefix sums are
    # bit-identical regardless of engine or partitioning.
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("run_value"),
    )


@query(
    "q08_events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, COUNT(*) AS n,
           (floor(AVG(value) * 1000000.0) / 1000000.0) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def q08(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            _floor6(F.avg("value")).alias("avg_value"),
        )
    )


@query(
    "q09_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def q09(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("timestamp").cast("long")
                - F.lag("ts").over(w).cast("timestamp").cast("long")
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "q10_rollup_docs",
    """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def q10(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@query(
    "q11_topk_docs",
    """
    SELECT doc_id, lang, n_chars FROM documents
    ORDER BY n_chars DESC, doc_id ASC LIMIT 20
    """,
)
def q11(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .select("doc_id", "lang", "n_chars")
        .limit(20)
    )


@query(
    "q12_clickers_not_buyers",
    """
    SELECT user_id FROM events
    WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-08 00:00:00'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
    """,
)
def q12(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp_ntz")
    )
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.distinct().exceptAll(buyers.distinct())


@query(
    "q13_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS k_sum
    FROM events GROUP BY 1
    """,
)
def q13(spark, sf_dir):
    # A9/A10 analog: JSON field extraction as a relational op
    # (reference _parse_json, extractor.py:110-130).
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy((k % 10).alias("k_mod")).agg(
        F.count("*").alias("n"), F.sum(k).alias("k_sum")
    )


# =====================================================================
# Text analysis & German normalization (B4/B7; training-data ops)
# =====================================================================

@query(
    "q14_normalize_german",
    f"""
    SELECT doc_id, {german.normalize_sql('text')} AS clean_text FROM documents
    """,
)
def q14(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", german.normalize_col(F.col("text")).alias("clean_text"))


@query(
    "q15_doc_stats",
    f"""
    SELECT doc_id,
           {textstats.token_count_sql('text')} AS n_tokens,
           {textstats.punct_ratio_sql('text')} AS punct_ratio,
           {textstats.stopword_ratio_sql('text')} AS stopword_ratio,
           {textstats.quality_score_sql('text')} AS quality,
           {textstats.langid_sql('text')} AS lang_guess
    FROM documents
    """,
)
def q15(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        textstats.token_count_col(t).alias("n_tokens"),
        textstats.punct_ratio_col(t).alias("punct_ratio"),
        textstats.stopword_ratio_col(t).alias("stopword_ratio"),
        textstats.quality_score_col(t).alias("quality"),
        textstats.langid_col(t).alias("lang_guess"),
    )


@query(
    "q16_langid_distribution",
    f"""
    SELECT {textstats.langid_sql('text')} AS lang_guess, lang AS lang_true,
           COUNT(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def q16(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        textstats.langid_col(F.col("text")).alias("lang_guess"),
        F.col("lang").alias("lang_true"),
    ).agg(F.count("*").alias("n"))


@query(
    "q39_curation_report",
    f"""
    WITH scored AS (
      SELECT source, lang,
             {textstats.quality_score_sql('text')} AS q,
             {textstats.langid_sql('text')} AS lang_guess,
             {textstats.token_count_sql('text')} AS toks
      FROM documents
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN q >= 0.5 AND lang_guess = lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN q >= 0.5 AND lang_guess = lang
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_drop,
           (floor(AVG(q) * 1000000.0) / 1000000.0) AS avg_quality,
           CAST(SUM(CASE WHEN q >= 0.5 AND lang_guess = lang
                         THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM scored GROUP BY source, lang
    """,
)
def q39(spark, sf_dir):
    # The corpus-curation decision a training-data pipeline executes:
    # score every document (quality composite + language agreement),
    # decide keep/drop, report per (source, lang) with the surviving
    # token budget. One map pass (all scoring is JVM codegen) + one
    # small groupBy — at 100 TB the scan dominates and the report is
    # a few hundred rows.
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    q = textstats.quality_score_col(t)
    keep = (q >= 0.5) & (textstats.langid_col(t) == F.col("lang"))
    scored = d.select(
        "source",
        "lang",
        q.alias("q"),
        keep.alias("keep"),
        textstats.token_count_col(t).alias("toks"),
    )
    return scored.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_drop"),
        _floor6(F.avg("q")).alias("avg_quality"),
        F.sum(F.when(F.col("keep"), F.col("toks")).otherwise(0)).alias(
            "kept_tokens"
        ),
    )


@query(
    "q17_exact_dedup",
    f"""
    SELECT {textstats.fingerprint_sql('text')} AS fp,
           MIN(doc_id) AS keeper, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def q17(spark, sf_dir):
    # Exact dedup: hash-groupBy on canonicalized text (map-side partial
    # agg; at 100 TB this is one shuffle on the 16-byte fingerprint).
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        textstats.fingerprint_col(F.col("text")).alias("fp")
    ).agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_dups"))


# =====================================================================
# Near-duplicate detection: shingles → Jaccard, MinHash, LSH bands
# (training-data dedup family; SURVEY Part B + task brief)
# =====================================================================

# Shared shingle CTE (DuckDB): word 3-grams via aligned unnest + lead(),
# hashed to the same 48-bit int64 the Spark side computes in-row.
_SHINGLE_CTE = """
    WITH tok AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
      FROM documents
    ), sh AS (
      SELECT doc_id,
             tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS sh
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), hsh AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 12))::BIGINT AS shh
      FROM sh WHERE sh IS NOT NULL)
"""

# Document-frequency cap for the shingle inverted index (q18): a shingle
# appearing in more than this many documents is a stop-phrase carrying no
# dedup signal, and its join fan-out is O(df^2) pairs — at 10^6 docs a
# single "der die das" key would emit 10^12 pairs that AQE can spread but
# never shrink. The cap bounds per-shingle pair output to
# CAP*(CAP-1)/2 (~2k pairs at 64). Sizing rule: keep CAP well below
# sqrt(total_pair_budget / n_distinct_hot_shingles); 64 is a standard
# production choice (cf. suffix-array/minhash dedup pipelines) and at
# 100 TB it makes the pair stage linear in corpus size.
Q18_SHINGLE_DF_CAP = 64


def _shingles(spark, sf_dir):
    """Distinct hashed word-3-gram shingles per doc: (doc_id, shh:int64).

    Built IN-ROW (transform over the token array) — the tokens of one
    document never leave their row, so there is no explode+window
    shuffle over the full token stream (at 100 TB that shuffle would
    move the entire corpus once just to see each token's two
    neighbors). Matches the SQL oracle's lead()-based formulation:
    i in [1, n_tokens-2] yields exactly the windows whose trailing
    partials the NULL-propagating `||` drops.

    Shingles are hashed to 48-bit int64 (md5 prefix) BEFORE the explode,
    so every downstream shuffle (df counting, inverted-index groupBy,
    MinHash groupBy) moves 8-byte keys instead of ~25-byte strings.
    Dedup happens on the hashed value in-row (array_distinct), which the
    oracle mirrors with DISTINCT over the same md5-prefix expression —
    a 48-bit in-doc collision merges the same shingles on both engines.
    MinHash is unaffected either way: min over a multiset ignores
    duplicates."""
    d = load(spark, sf_dir, "documents")
    sh_arr = F.expr(
        "CASE WHEN size(toks) >= 3 THEN "
        "array_distinct(transform(sequence(1, size(toks) - 2),"
        " i -> cast(conv(substring(md5("
        "concat_ws(' ', toks[i-1], toks[i], toks[i+1])), 1, 12), 16, 10)"
        " as bigint))) "
        "ELSE array() END"
    )
    return (
        d.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.split(F.trim("text"), r"\s+").alias("toks"),
        )
        .select("doc_id", F.explode(sh_arr).alias("shh"))
    )


@query(
    "q18_ngram_jaccard_pairs",
    _SHINGLE_CTE
    + f"""
    , groups AS (
      SELECT shh, COUNT(*) AS df FROM hsh GROUP BY shh
      HAVING COUNT(*) <= {Q18_SHINGLE_DF_CAP}
    ),
    capped AS (SELECT h.doc_id, h.shh FROM hsh h JOIN groups USING (shh)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM capped a JOIN capped b ON a.shh = b.shh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           (floor(inter * 1000000.0 / (sa.sz + sb.sz - inter)) / 1000000.0)
             AS jaccard
    FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a
                 JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE inter * 2.0 > (sa.sz + sb.sz - inter)
    """,
)
def q18(spark, sf_dir):
    # Shingle inverted index with a document-frequency cap: postings are
    # grouped BY SHINGLE, lists longer than Q18_SHINGLE_DF_CAP (stop
    # phrases) are dropped, and candidate pairs are generated IN-ROW
    # from each surviving (sorted) posting list — so per-shingle pair
    # output is hard-bounded at CAP*(CAP-1)/2 and the whole pair stage
    # is linear in corpus size. Jaccard is then computed over the capped
    # shingle universe (sizes count only df<=CAP shingles), which the
    # oracle mirrors exactly. No O(n^2) pair enumeration anywhere.
    posts = _shingles(spark, sf_dir)
    groups = posts.groupBy("shh").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ds")
    ).filter(F.size("ds") <= Q18_SHINGLE_DF_CAP)
    sizes = (
        groups.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    # ds is sorted, so j<i gives doc_a < doc_b with no post-filter.
    pair_arr = F.expr(
        "flatten(transform(sequence(1, size(ds) - 1),"
        " i -> transform(sequence(0, i - 1),"
        " j -> struct(ds[j] AS doc_a, ds[i] AS doc_b))))"
    )
    pairs = (
        groups.filter(F.size("ds") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(
            F.col("inter") * 2.0 > (F.col("sa.sz") + F.col("sb.sz") - F.col("inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    F.col("inter")
                    * 1000000.0
                    / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter"))
                )
                / 1000000.0
            ).alias("jaccard"),
        )
    )


# MinHash parameters: x reduced mod p first so a*x+b stays < 2^41.
_MH_P = 2147483647
_MH_COEF = ((2, 1), (3, 7), (5, 11), (7, 19), (11, 23), (13, 31))

# MinHash LSH banding — SCALE PARAMETERS (b bands of r rows):
# P(candidate | Jaccard=s) = 1 - (1 - s^r)^b, an S-curve with threshold
# ≈ (1/b)^(1/r). b=3, r=2 puts the threshold at ~0.57 — tuned for
# "near-dup" (J >= 0.5). At larger corpus sizes keep r*b = len(_MH_COEF)
# signatures but raise r (narrower buckets, fewer false candidates) —
# the same budget trade as SH_BAND_BITS above.
MH_ROWS_PER_BAND = 2
MH_N_BANDS = len(_MH_COEF) // MH_ROWS_PER_BAND


def _minhash_df(spark, sf_dir):
    # Operates on the 48-bit hashed shingles from _shingles — min over a
    # multiset is dedup-insensitive, so hashed-value dedup changes nothing.
    shd = _shingles(spark, sf_dir)
    x = F.col("shh") % F.lit(_MH_P)
    aggs = [
        F.min((F.lit(a) * x + F.lit(b)) % F.lit(_MH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(_MH_COEF)
    ]
    return shd.groupBy("doc_id").agg(*aggs)


def _minhash_sql_cols() -> str:
    x = f"(shh % {_MH_P})"
    return ", ".join(
        f"MIN(({a} * {x} + {b}) % {_MH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_MH_COEF)
    )


@query(
    "q19_minhash_signatures",
    _SHINGLE_CTE
    + f"""
    SELECT doc_id, {_minhash_sql_cols()}
    FROM hsh GROUP BY doc_id
    """,
)
def q19(spark, sf_dir):
    # MinHash signature = k independent permutation-min hashes per doc;
    # one shuffle (groupBy doc_id), map-side partial min.
    return _minhash_df(spark, sf_dir)


def _mh_bands_sql() -> str:
    """Band CTE generated from (MH_N_BANDS, MH_ROWS_PER_BAND) so the
    oracle can never drift from the Spark band layout."""
    selects = "\n      UNION ALL\n      ".join(
        "SELECT doc_id, {i} AS band, {sig} AS sig FROM mh".format(
            i=i,
            sig=" || ':' || ".join(
                f"mh{i * MH_ROWS_PER_BAND + r}" for r in range(MH_ROWS_PER_BAND)
            ),
        )
        for i in range(MH_N_BANDS)
    )
    return f"bands AS (\n      {selects}\n    )"


@query(
    "q20_lsh_candidate_pairs",
    _SHINGLE_CTE
    + f"""
    , mh AS (SELECT doc_id, {_minhash_sql_cols()} FROM hsh GROUP BY doc_id),
    {_mh_bands_sql()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band) AS n_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def q20(spark, sf_dir):
    # LSH banding: docs sharing any band signature are candidates —
    # the bucket-join replaces all-pairs comparison (shuffle key =
    # (band, sig); bucket sizes bound the join fan-out). (b, r) sizing
    # rule at the MH_N_BANDS/MH_ROWS_PER_BAND definition.
    mh = _minhash_df(spark, sf_dir)
    # all bands in ONE pass over the signatures: posexplode of an
    # in-row array (pos IS the band id) instead of an N-way union that
    # would re-read the aggregated-signature subtree per band
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        *[
                            f"mh{band * MH_ROWS_PER_BAND + r}"
                            for r in range(MH_ROWS_PER_BAND)
                        ],
                    )
                    for band in range(MH_N_BANDS)
                ]
            )
        ).alias("band", "sig"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct(F.col("a.band")).alias("n_bands"))
    )


# =====================================================================
# Embedding similarity: brute-force cosine top-k + sign-LSH bucketed ANN
# =====================================================================

# Exact cross-engine dot products: explode dims, multiply as DOUBLE,
# sum as DECIMAL(28,12) (order-independent), divide as DOUBLE.
_EMB_DIMS_CTE = """
    WITH dims AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
      FROM dims GROUP BY vec_id
    )
"""


# In-row exact arithmetic over embedding arrays — the Spark-side scale
# path. The oracle SQL keeps the relational dims-explosion formulation;
# value parity holds because both sum the SAME per-element
# DECIMAL(28,12) products exactly (decimal addition is associative and
# exact, so in-row left fold == SQL SUM over exploded rows).
def _fold_dec(arr):
    """Exact sum of a decimal(28,12) array via left fold.

    Null elements are dropped before folding: zip_with pads unequal-
    length arrays with nulls, and a null product would otherwise poison
    the whole sum — dropping them matches the oracles' relational form
    (an inner join on pos sums only the shared positions).

    The ACCUMULATOR is decimal(38,12) — the same width SQL SUM over
    decimal(28,12) widens to on both engines — so the fold has identical
    overflow headroom to the oracles: a sum past ~10^16 would otherwise
    null out here while the SQL SUM kept going (ADVICE r01)."""
    return F.aggregate(
        F.filter(arr, lambda x: x.isNotNull()),
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, x: (acc + x).cast("decimal(38,12)"),
    ).cast("double")


def _dot_dec(a, b):
    """Exact dot product of two float arrays (decimal accumulation)."""
    return _fold_dec(
        F.zip_with(
            a,
            b,
            lambda x, y: (
                x.cast("double") * y.cast("double")
            ).cast("decimal(28,12)"),
        )
    )


def _nrm_dec(a):
    return F.sqrt(_dot_dec(a, a))


def _load_embeddings(spark, sf_dir):
    """Embeddings restricted to the oracles' implicit domain: the
    relational dims-explosion (``unnest``) drops empty/null vectors
    entirely, while the in-row rewrites would emit rows (bucket 0 /
    null cosine) for them — filter them out so the Spark and oracle
    domains stay identical on any input (ADVICE r01; fixture vectors
    are all length-64 non-null, so this is a no-op there)."""
    return load(spark, sf_dir, "embeddings").filter(F.size("embedding") > 0)


def _sign_bucket_expr(col_name: str = "embedding"):
    """Sign-LSH bucket from the first 8 dims, in-row (matches
    _SIGN_BUCKET_SQL: sum of 2^(pos-1) where v >= 0)."""
    return F.expr(
        f"aggregate(transform(slice({col_name}, 1, 8),"
        " (x, i) -> IF(CAST(x AS DOUBLE) >= 0,"
        " CAST(pow(2, i) AS BIGINT), 0L)), 0L, (a, b) -> a + b)"
    )


@query(
    "q21_cosine_topk",
    _EMB_DIMS_CTE
    + """
    , dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(q.v * c.v AS DECIMAL(28,12))) AS DOUBLE) AS dot
      FROM dims q JOIN dims c ON q.pos = c.pos AND q.vec_id < 5
                                AND c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ), scored AS (
      SELECT query_id, neighbor_id,
             (floor(dot / (nq.nrm * nc.nrm) * 1000000.0) / 1000000.0) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY (floor(dot / (nq.nrm * nc.nrm) * 1000000.0) / 1000000.0) DESC,
                        neighbor_id ASC) AS rn
      FROM dots JOIN norms nq ON nq.vec_id = dots.query_id
                JOIN norms nc ON nc.vec_id = dots.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rn FROM scored WHERE rn <= 5
    """,
)
def q21(spark, sf_dir):
    # Brute-force cosine top-k — the correctness baseline for ANN.
    # Spark-first scale shape: the 5 query vectors are BROADCAST with
    # their arrays intact and every dot product is computed IN-ROW
    # (zip_with + exact decimal fold) — one map-side pass over the
    # corpus, no dims explosion, no join on pos, no re-aggregation.
    # The oracle replays the same arithmetic relationally in DuckDB.
    e = _load_embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _nrm_dec(F.col("embedding")).alias("q_nrm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _nrm_dec(F.col("embedding")).alias("c_nrm"),
    )
    cos = (
        F.floor(
            _dot_dec(F.col("q_emb"), F.col("c_emb"))
            / (F.col("q_nrm") * F.col("c_nrm"))
            * 1000000.0
        )
        / 1000000.0
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


_SIGN_BUCKET_SQL = """
    buckets AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN v >= 0 THEN CAST(pow(2, pos - 1) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM dims WHERE pos <= 8 GROUP BY vec_id
    )
"""


def _bucketed_cos_pairs(spark, sf_dir):
    """Shared scale path for q22/q34: sign-LSH bucket equi-join with
    the embedding arrays carried in-row; cosine computed per pair with
    zip_with + exact decimal fold. ONE shuffle (the bucket join key);
    no dims explosion, no pos-join, no per-pair re-aggregation."""
    e = _load_embeddings(spark, sf_dir).select(
        "vec_id",
        "embedding",
        _sign_bucket_expr().alias("bucket"),
        _nrm_dec(F.col("embedding")).alias("nrm"),
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = (
        F.floor(
            _dot_dec(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.nrm") * F.col("b.nrm"))
            * 1000000.0
        )
        / 1000000.0
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
    )


@query(
    "q22_ann_bucket_neighbors",
    _EMB_DIMS_CTE
    + ","
    + _SIGN_BUCKET_SQL
    + """
    , dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM(CAST(da.v * db.v AS DECIMAL(28,12))) AS DOUBLE) AS dot
      FROM buckets a JOIN buckets b
           ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      JOIN dims da ON da.vec_id = a.vec_id
      JOIN dims db ON db.vec_id = b.vec_id AND db.pos = da.pos
      GROUP BY 1, 2
    ), scored AS (
      SELECT vec_a, vec_b,
             (floor(dot / (na.nrm * nb.nrm) * 1000000.0) / 1000000.0) AS cos_sim
      FROM dots JOIN norms na ON na.vec_id = vec_a
                JOIN norms nb ON nb.vec_id = vec_b
    ), ranked AS (
      SELECT vec_a AS vec_id, vec_b AS nn_id, cos_sim FROM scored
      UNION ALL
      SELECT vec_b, vec_a, cos_sim FROM scored
    )
    SELECT vec_id, nn_id, cos_sim FROM (
      SELECT vec_id, nn_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, nn_id ASC) AS rn
      FROM ranked) WHERE rn = 1
    """,
)
def q22(spark, sf_dir):
    # ANN scale path: sign-LSH buckets bound the candidate set; cosine
    # is computed only within buckets (bucket equi-join), then each
    # vector keeps its best in-bucket neighbor — the near-dup candidate
    # list at 10^12 scale (bucket join ≪ all-pairs).
    scored = _bucketed_cos_pairs(spark, sf_dir)
    ranked = scored.select(
        F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("nn_id"), "cos_sim"
    ).unionAll(
        scored.select(
            F.col("vec_b").alias("vec_id"), F.col("vec_a").alias("nn_id"), "cos_sim"
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn_id", "cos_sim")
    )


@query(
    "q23_bucket_histogram",
    _EMB_DIMS_CTE
    + ","
    + _SIGN_BUCKET_SQL
    + """
    SELECT bucket, COUNT(*) AS n_vectors FROM buckets GROUP BY bucket
    """,
)
def q23(spark, sf_dir):
    # Bucket-size histogram: the skew diagnostic for the ANN path (a
    # hot bucket is exactly the salting trigger at scale). Bucket ids
    # computed in-row — one map pass + one tiny groupBy.
    e = _load_embeddings(spark, sf_dir)
    return (
        e.select(_sign_bucket_expr().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


@query(
    "q33_ivf_assign",
    _EMB_DIMS_CTE
    + """
    , cents AS (SELECT vec_id AS cell, pos, v FROM dims WHERE vec_id < 16),
    dists AS (
      SELECT d.vec_id, c.cell,
             CAST(SUM(CAST((d.v - c.v) * (d.v - c.v) AS DECIMAL(28,12))) AS DOUBLE)
               AS d2
      FROM dims d JOIN cents c ON c.pos = d.pos
      WHERE d.vec_id >= 16
      GROUP BY 1, 2
    )
    SELECT vec_id, cell,
           (floor(sqrt(d2) * 1000000.0) / 1000000.0) AS dist
    FROM (SELECT vec_id, cell, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY d2 ASC, cell ASC) AS rn
          FROM dists)
    WHERE rn = 1
    """,
)
def q33(spark, sf_dir):
    # IVF coarse quantization: assign each vector to its nearest of 16
    # deterministic centroids (vectors 0..15 as seeds). The centroid
    # table is BROADCAST (a few KB) with arrays intact; each corpus row
    # computes its 16 squared distances IN-ROW (zip_with + exact
    # decimal fold) and the per-vector argmin is a window over 16 rows
    # — one map-side pass, no dims explosion, no pos-join, no
    # re-aggregation. Exact DECIMAL sums keep Spark == DuckDB.
    e = _load_embeddings(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    d = e.filter(F.col("vec_id") >= 16)
    d2 = _fold_dec(
        F.zip_with(
            F.col("embedding"),
            F.col("c_emb"),
            lambda x, y: (
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ).cast("decimal(28,12)"),
        )
    )
    dists = d.join(F.broadcast(cents)).select("vec_id", "cell", d2.alias("d2"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cell"))
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cell",
            (F.floor(F.sqrt("d2") * 1000000.0) / 1000000.0).alias("dist"),
        )
    )


# =====================================================================
# Span round-trip, multimodal metadata, MIME routing
# =====================================================================

@query(
    "q24_span_roundtrip",
    """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS rebuilt
    FROM documents
    """,
)
def q24(spark, sf_dir):
    # Explode → reassemble integrity (B2+B8): chunk each doc into
    # 10-token spans, explode, then rebuild from (pos, chunk) — the
    # oracle is the identity, so any ordering bug breaks equality.
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(toks) / 10).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)),
    )
    exploded = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(chunks).alias("pos", "chunk"),
    )
    return exploded.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s.chunk,
            ),
            " ",
        ).alias("rebuilt")
    )


@query(
    "q25_media_bytes",
    """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(SUM(length(to_base64(encode(text)))) AS BIGINT) AS total_b64_chars
    FROM documents GROUP BY source
    """,
)
def q25(spark, sf_dir):
    # Multimodal plumbing: opaque binary payloads carry typed metadata;
    # byte-length accounting per source (binary column exercised JVM-side).
    # A8 (base64 payload encode, reference ollama_backend.py:98-101) is
    # exercised via the built-in F.base64. Spark 4.x emits MIME-chunked
    # base64 (CRLF every 76 chars) while DuckDB's to_base64 is unchunked
    # RFC-4648, so strip the chunk markers before measuring — the
    # unchunked length is the cross-engine invariant.
    d = load(spark, sf_dir, "documents")
    raw = F.encode("text", "UTF-8")
    b64 = F.regexp_replace(F.base64(raw), "[\\r\\n]", "")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(raw)).alias("total_bytes"),
        F.sum(F.length(b64)).alias("total_b64_chars"),
    )


@query(
    "q26_mime_route",
    """
    SELECT CASE
             WHEN CAST(substr(source, 4) AS INT) % 4 = 0 THEN 'application/pdf'
             WHEN CAST(substr(source, 4) AS INT) % 4 = 1 THEN 'text/html'
             WHEN CAST(substr(source, 4) AS INT) % 4 = 2 THEN 'image/png'
             ELSE 'text/plain'
           END AS mime,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q26(spark, sf_dir):
    # A3/A4 analog: extension→MIME routing as a when/otherwise
    # expression (reference _prepare_file allow-list + MIME map,
    # cloud_client.py:269-311).
    d = load(spark, sf_dir, "documents")
    n = F.substring("source", 4, 10).cast("int")
    mime = (
        F.when(n % 4 == 0, "application/pdf")
        .when(n % 4 == 1, "text/html")
        .when(n % 4 == 2, "image/png")
        .otherwise("text/plain")
    )
    return d.groupBy(mime.alias("mime")).agg(F.count("*").alias("n_docs"))


# =====================================================================
# Structured extraction (A9-A11): JSON payload → typed columns
# =====================================================================

# Deterministic model-output payloads synthesized from doc_id: fenced
# JSON, bare form JSON, JSON wrapped in prose, and malformed JSON — the
# four shapes the reference's _parse_json handles (extractor.py:110-130).
_PAYLOAD_SQL = """
    WITH base AS (
      SELECT doc_id,
             '{"type":"invoice","invoice_number":"INV-' || doc_id ||
             '","date":"2024-01-15","items":[{"p":"a"},{"p":"b"}],"totals":{"gross":'
             || CAST(doc_id % 100 AS VARCHAR) || '.25}}' AS inv
      FROM documents
    ), payloads AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN chr(96)||chr(96)||chr(96)||'json'||chr(10)|| inv ||chr(10)||chr(96)||chr(96)||chr(96)
               WHEN 1 THEN '{"type":"form","title":"Formular ' || doc_id ||
                           '","fields":[{"name":"f1"},{"name":"f2"}]}'
               WHEN 2 THEN 'Ergebnis: ' || inv || ' Ende.'
               ELSE '{"type":"invoice","invoice_number": KAPUTT'
             END AS raw_response
      FROM base
    ), cleaned AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(raw_response, '^\\s*```(json)?\\s*', ''),
                            '\\s*```\\s*$', '') AS nofence
      FROM payloads
    ), chosen AS (
      SELECT doc_id,
             CASE WHEN length(regexp_extract(nofence, '(\\{[\\s\\S]*\\})', 1)) > 0
                  THEN regexp_extract(nofence, '(\\{[\\s\\S]*\\})', 1)
                  ELSE nofence END AS js
      FROM cleaned
    )
    SELECT doc_id,
           CASE WHEN json_valid(js)
                THEN coalesce(json_extract_string(js, '$.type'), 'document') END
             AS doc_type,
           json_valid(js) AS success,
           CASE WHEN json_valid(js)
                THEN json_extract_string(js, '$.invoice_number') END AS invoice_number,
           CASE WHEN json_valid(js)
                THEN CAST(json_array_length(js, '$.items') AS INT) END AS n_items,
           CASE WHEN json_valid(js)
                THEN CAST(json_extract(js, '$.totals.gross') AS DOUBLE) END AS gross,
           CASE WHEN json_valid(js)
                THEN json_extract_string(js, '$.title') END AS title
    FROM chosen
"""


def _payloads(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    inv = F.concat(
        F.lit('{"type":"invoice","invoice_number":"INV-'),
        F.col("doc_id").cast("string"),
        F.lit('","date":"2024-01-15","items":[{"p":"a"},{"p":"b"}],"totals":{"gross":'),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(".25}}"),
    )
    m = F.col("doc_id") % 4
    payload = (
        F.when(m == 0, F.concat(F.lit("```json\n"), inv, F.lit("\n```")))
        .when(
            m == 1,
            F.concat(
                F.lit('{"type":"form","title":"Formular '),
                F.col("doc_id").cast("string"),
                F.lit('","fields":[{"name":"f1"},{"name":"f2"}]}'),
            ),
        )
        .when(m == 2, F.concat(F.lit("Ergebnis: "), inv, F.lit(" Ende.")))
        .otherwise(F.lit('{"type":"invoice","invoice_number": KAPUTT'))
    )
    return d.select("doc_id", payload.alias("raw_response"))


@query("q27_structured_extract", _PAYLOAD_SQL)
def q27(spark, sf_dir):
    """A9-A11 end to end: fence strip → lenient from_json (corrupt
    detection) → type dispatch → typed fields with defaults — one
    WholeStageCodegen select chain, no Python (reference does this
    per-doc in extractor.py:110-223)."""
    from .operators.structured import structured_extract

    out = structured_extract(_payloads(spark, sf_dir))
    return out.select(
        "doc_id",
        "doc_type",
        "success",
        F.col("data.invoice_number").alias("invoice_number"),
        F.size("data.items").alias("n_items"),
        F.col("data.totals")["gross"].alias("gross"),
        F.col("data.title").alias("title"),
    )


# =====================================================================
# SimHash near-dup: 16-bit signatures + banded candidate pairs
# =====================================================================

_SH_BITS = 48

# SimHash LSH band sizing — SCALE PARAMETERS, not magic numbers.
# Bands of SH_BAND_BITS bits each: expected bucket size is
# n / 2^SH_BAND_BITS, and each band's self-join emits
# ~n^2 / 2^SH_BAND_BITS candidate pairs in total, so band bits must
# GROW with corpus size: pick SH_BAND_BITS ≈ log2(n / target_bucket),
# e.g. 12 bits for 10^5-10^6 docs (buckets of ~25-250), 30+ bits for
# 10^12 (composing several signature slices into one key). Fewer,
# wider bands trade recall for pair volume exactly like MinHash
# banding (b bands of r bits ⇒ P(candidate) = 1-(1-p^r)^b).
# q41_simhash_band_histogram is the live skew diagnostic: its max
# bucket size tells you when to raise SH_BAND_BITS.
SH_BAND_BITS = 12
SH_N_BANDS = 4

_SH_TOK = """
    WITH tok AS (
      SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ), th AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM tok
    )
"""


def _simhash_sql_expr() -> str:
    bits = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(_SH_BITS)
    )
    return bits


def _simhash_df(spark, sf_dir):
    # The whole signature IN-ROW, zero shuffles: a document's distinct
    # tokens (array_distinct — one row, so per-doc distinct needs no
    # global distinct shuffle) hash to an in-row long array; each bit's
    # majority vote is a size(filter(...)) over that array. q28 becomes
    # a pure map-only plan; q29 shuffles only at the band self-join.
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.trim("text"), r"\s+"))
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long")
    )
    df = d.select(F.col("doc_id").cast("string").alias("doc_id"), hs.alias("hs"))
    sig = None
    n = F.size("hs")
    for b in range(_SH_BITS):
        ones = F.size(
            F.filter("hs", lambda h: F.shiftright(h, b).bitwiseAND(1) == 1)
        )
        # majority of (+1 per set bit, -1 per clear bit) >= 0  ⇔  2*ones >= n
        term = F.when(ones * 2 >= n, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return df.select("doc_id", sig.cast("long").alias("simhash"))


@query(
    "q28_simhash_signatures",
    _SH_TOK + f"SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM th GROUP BY doc_id",
)
def q28(spark, sf_dir):
    return _simhash_df(spark, sf_dir)


def _sh_bands_sql() -> str:
    """Band CTE generated from (SH_N_BANDS, SH_BAND_BITS) so the oracle
    can never drift from the Spark band layout."""
    mask = (1 << SH_BAND_BITS) - 1
    selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash >> {SH_BAND_BITS * i}) & {mask} AS key FROM sig"
        for i in range(SH_N_BANDS)
    )
    return f"bands AS (\n      {selects}\n    )"


def _sh_bands_df(spark, sf_dir):
    """(doc_id, simhash, band, key): all SH_N_BANDS band keys from ONE
    posexplode pass over an in-row array (pos IS the band id) — no
    N-way union re-reading the signature subtree."""
    mask = (1 << SH_BAND_BITS) - 1
    sig = _simhash_df(spark, sf_dir)
    return sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", SH_BAND_BITS * i)
                    .bitwiseAND(mask)
                    .cast("long")
                    for i in range(SH_N_BANDS)
                ]
            )
        ).alias("band", "key"),
    )


@query(
    "q29_simhash_near_dups",
    _SH_TOK
    + f"""
    , sig AS (SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM th GROUP BY doc_id),
    {_sh_bands_sql()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3
    """,
)
def q29(spark, sf_dir):
    # Banded SimHash LSH: SH_N_BANDS bands of SH_BAND_BITS bits bound
    # the candidate join (collision prob 2^-SH_BAND_BITS per band vs
    # all-pairs n^2); hamming distance verified with bit_count(xor)
    # JVM-side. Band sizing rule at the constants' definition.
    bands = _sh_bands_df(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).alias("hamming")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming,
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


@query(
    "q41_simhash_band_histogram",
    _SH_TOK
    + f"""
    , sig AS (SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM th GROUP BY doc_id),
    {_sh_bands_sql()}
    SELECT band, key, COUNT(*) AS n_docs FROM bands GROUP BY band, key
    """,
)
def q41(spark, sf_dir):
    # Band-bucket histogram for the SimHash LSH (q23 pattern applied to
    # q29): the live skew diagnostic proving the SH_BAND_BITS sizing —
    # max(n_docs) is the largest self-join bucket; when it outgrows the
    # target (~n / 2^SH_BAND_BITS), raise SH_BAND_BITS. One map pass +
    # one small groupBy; at 100 TB the histogram itself is tiny
    # (≤ SH_N_BANDS * 2^SH_BAND_BITS rows).
    return (
        _sh_bands_df(spark, sf_dir)
        .groupBy("band", "key")
        .agg(F.count("*").alias("n_docs"))
    )


# =====================================================================
# Multimodal: binary media columns through the stubbed-codec kernels
# (no DuckDB oracle — binary decode is not SQL-expressible; the driver
# records the weaker rows-only check, full value checks live in
# tests/test_multimodal.py)
# =====================================================================

@query("q30_media_features")
def q30(spark, sf_dir):
    """Image/audio/video fixture rows → decoded metadata via the
    mapInPandas fake-codec kernels, aggregated per media_type. Sorted
    deterministic output; the stub boundary (real PNG magic) surfaces
    as error_rows=1."""
    from .operators.multimodal import audio_features, frame_sample, image_meta
    from .synth import media_to_spark, synth_media

    # 120 fixture rows don't need 32 partitions: coalesce so the three
    # kernel branches don't each fan out one Python worker per empty
    # partition (at real scale the media table arrives pre-partitioned
    # from storage and this narrow coalesce is a no-op decision).
    media = media_to_spark(spark, synth_media(120, seed=42)).coalesce(4)
    img = image_meta(media.filter(F.col("media_type") == "image")).agg(
        F.lit("image").alias("media_type"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_rows"),
        F.sum(F.when(F.col("error").isNull(), F.col("width") * F.col("height"))).alias(
            "total_units"
        ),
    )
    aud = audio_features(media.filter(F.col("media_type") == "audio")).agg(
        F.lit("audio").alias("media_type"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_rows"),
        F.sum(F.when(F.col("error").isNull(), F.col("duration_ms"))).alias(
            "total_units"
        ),
    )
    vid = frame_sample(media.filter(F.col("media_type") == "video"), every_k=5).agg(
        F.lit("video").alias("media_type"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_rows"),
        F.count(F.when(F.col("error").isNull(), 1)).alias("total_units"),
    )
    return img.unionAll(aud).unionAll(vid).orderBy("media_type")


# =====================================================================
# Sinks / batch-output aggregation (A12-A14)
# =====================================================================

@query(
    "q31_markdown_blocks",
    f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           '=== ' || CAST(doc_id AS VARCHAR) || ' ===' || chr(10) ||
           {german.normalize_sql('text')} || chr(10) ||
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS block
    FROM documents
    """,
)
def q31(spark, sf_dir):
    """A13: the CLI's '=== name ===' block concatenation (cli.py:90-93)
    over the flagship pipeline's extracted spans — collect_list ordered
    by the explicit order column, value-checked by recomputing both
    kernels in SQL."""
    from .operators.extract import extract_pipeline
    from .sinks import markdown_blocks

    d = load(spark, sf_dir, "documents")
    docs = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("ocr").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("  "), F.col("text"), F.lit(" \t")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(10).alias("offset"),
            ),
        ).alias("spans"),
    )
    return markdown_blocks(extract_pipeline(docs))


_Q32_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "q32_spans.parquet",
)


@query(
    "q32_extract_html_pdf",
    f"""
    SELECT doc_id, "order", kind, text, media_ref, error, error_code
    FROM '{_Q32_GOLDEN}'
    """,
)
def q32(spark, sf_dir):
    """The HTML-boilerplate (B5) and XY-cut PDF (B6) kernels through the
    full distributed pipeline over the deterministic synthetic corpus,
    value-checked against the committed SINGLE-NODE golden parquet
    (tests/golden/q32_spans.parquet, regenerated by
    tools/make_golden.py): the same pure pandas kernels run through the
    plain-pandas golden_extract path with none of the Spark plumbing.
    The oracle is a straight SELECT of that file, so the driver verifies
    that Arrow batching, salted repartition, and the shuffle-free
    in-row ordering reproduce the single-node result byte-for-byte —
    the engine's centerpiece kernels get a full hash gate instead of a
    rows-only count."""
    from .operators.extract import extract_pipeline
    from .synth import synth_docs_distributed

    # 400 fixture docs: size the generation partitioning to the data
    # (default 2x-parallelism partitioning exists for real corpora; at
    # 6 docs/partition the per-task Python/Arrow overhead would dwarf
    # the kernels ~60:1).
    docs = synth_docs_distributed(spark, 400, seed=42, n_partitions=8).filter(
        F.exists("spans", lambda s: s["kind"].isin("html", "pdf"))
    )
    out = extract_pipeline(docs, salt_partitions=16)
    return out.filter(F.col("kind").isin("html", "pdf")).select(
        "doc_id", "order", "kind", "text", "media_ref", "error", "error_code"
    )


# =====================================================================
# Embedding-cosine near-dup DEDUP (distinct from q21/q22 similarity
# search: threshold pairs inside LSH buckets → canonical-keeper
# assignment, the actual "drop these rows" decision a training-data
# pipeline executes)
# =====================================================================

@query(
    "q34_embedding_near_dup",
    _EMB_DIMS_CTE
    + ","
    + _SIGN_BUCKET_SQL
    + """
    , dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM(CAST(da.v * db.v AS DECIMAL(28,12))) AS DOUBLE) AS dot
      FROM buckets a JOIN buckets b
           ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      JOIN dims da ON da.vec_id = a.vec_id
      JOIN dims db ON db.vec_id = b.vec_id AND db.pos = da.pos
      GROUP BY 1, 2
    ), pairs AS (
      SELECT vec_a, vec_b,
             (floor(dot / (na.nrm * nb.nrm) * 1000000.0) / 1000000.0) AS cos_sim
      FROM dots JOIN norms na ON na.vec_id = vec_a
                JOIN norms nb ON nb.vec_id = vec_b
      WHERE (floor(dot / (na.nrm * nb.nrm) * 1000000.0) / 1000000.0) >= 0.30
    )
    SELECT vec_b AS dup_id, MIN(vec_a) AS keeper,
           COUNT(*) AS n_matches, MAX(cos_sim) AS best_cos
    FROM pairs GROUP BY vec_b
    """,
)
def q34(spark, sf_dir):
    # Embedding-cosine near-dup dedup: sign-LSH buckets bound the pair
    # space (bucket equi-join, never all-pairs), exact in-row cosine
    # confirms, then each vector whose similarity to a LOWER-id
    # bucket-mate clears the threshold is marked a duplicate of the
    # smallest such keeper — the deterministic drop-list. At 10^12
    # scale the bucket join shuffles only on the bucket key and AQE
    # splits hot buckets; generalizes the reference's batch result
    # aggregation (german_ocr/cli.py:83-93) into corpus-level curation.
    pairs = _bucketed_cos_pairs(spark, sf_dir).filter(F.col("cos_sim") >= 0.30)
    return pairs.groupBy(F.col("vec_b").alias("dup_id")).agg(
        F.min("vec_a").alias("keeper"),
        F.count("*").alias("n_matches"),
        F.max("cos_sim").alias("best_cos"),
    )


# =====================================================================
# BPE-ish regex tokenization + rolling-hash winnowing fingerprints
# (text-analysis family: the task brief's "whitespace + a BPE-ish
# regex" token counter and "document fingerprinting (rolling hash)")
# =====================================================================

# GPT-2-style pretokenizer, simplified to the dialect subset Java regex
# and RE2 evaluate identically: letter runs (with German umlauts/ß),
# digit runs, and punctuation runs, each with an optional leading space.
_BPE_PAT = r" ?[A-Za-zÄÖÜäöüß]+| ?[0-9]+| ?[^A-Za-z0-9ÄÖÜäöüß\s]+"


@query(
    "q35_bpe_token_count",
    f"""
    SELECT doc_id,
           {textstats.token_count_sql('text')} AS n_ws_tokens,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE length(regexp_extract_all(text,
                  ' ?[A-Za-zÄÖÜäöüß]+| ?[0-9]+| ?[^A-Za-z0-9ÄÖÜäöüß\\s]+'))
           END AS n_bpe_tokens
    FROM documents
    """,
)
def q35(spark, sf_dir):
    # Token counting two ways: whitespace split and a BPE-ish
    # pretokenizer regex (GPT-2-family pattern restricted to the
    # Java/RE2-identical subset). Both are single-pass JVM codegen
    # expressions — zero shuffle, zero Python; at 100 TB this is the
    # map-only per-document token budget pass before packing.
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_bpe = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(t, F.lit(_BPE_PAT), F.lit(0)))
    )
    return d.select(
        "doc_id",
        textstats.token_count_col(t).alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
    )


@query(
    "q36_winnow_fingerprint",
    r"""
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS c
      FROM documents
    ), grams AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(c) - 7, 1)),
               i -> md5(substring(c, CAST(i AS INTEGER), 8))) AS hs
      FROM canon
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(hs) - 3, 1)),
               j -> list_min(hs[CAST(j AS INTEGER):CAST(j + 3 AS INTEGER)]))) AS fps
      FROM grams
    )
    SELECT doc_id, length(fps) AS n_fps, list_min(fps) AS min_fp FROM wins
    """,
)
def q36(spark, sf_dir):
    # Rolling-hash winnowing fingerprints (Schleimer/Wilkerson/Aiken
    # MOSS scheme): char 8-gram hashes → min-hash per sliding window of
    # 4 → distinct mins are the document's fingerprint set. Computed
    # ENTIRELY in-row with higher-order array functions (sequence /
    # transform / slice / array_min) — a map-only, zero-shuffle,
    # zero-Python plan that scales linearly with executors; the
    # fingerprint set then feeds the same groupBy dedup as q17.
    d = load(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    grams = d.select("doc_id", canon.alias("c")).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(length(c) - 7, 1)),"
            " i -> md5(substring(c, i, 8)))"
        ).alias("hs"),
    )
    wins = grams.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(1, greatest(size(hs) - 3, 1)),"
            " j -> array_min(slice(hs, j, 4))))"
        ).alias("fps"),
    )
    return wins.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
    )


# =====================================================================
# Streaming surface in the driver contract: the windowed-rates
# transformation value-checked in batch mode (identical semantics),
# plus a real availableNow streaming run (rows-only)
# =====================================================================

@query(
    "q37_windowed_rates",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS win_end,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q37(spark, sf_dir):
    # The streaming windowed-rates transformation (watermark + tumbling
    # event-time window, streaming/incremental.py) run on the batch
    # events table — Structured Streaming transformations are plan
    # fragments, so the SAME function runs under readStream (see
    # q38 / tests/test_streaming.py) and here, where DuckDB can
    # value-check it: 1-hour tumbling windows == date_trunc('hour').
    from .streaming.incremental import windowed_rates

    ev = load(spark, sf_dir, "events")
    r = windowed_rates(ev, watermark="30 minutes", window="1 hour")
    return r.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.date_format("win_end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
        "event_type",
        "n",
        "sum_value",
    )


@query("q38_stream_extract")
def q38(spark, sf_dir):
    """A real Structured Streaming run of the extraction pipeline:
    availableNow trigger over a synthesized parquet drop directory,
    exactly-once per file via the checkpoint, append-mode parquet sink
    (no DuckDB oracle — streaming execution is not SQL-replayable; the
    batch-equality and resume value checks live in
    tests/test_streaming.py). Deterministic: fresh checkpoint + input
    per invocation, per-kind summary with a content hash."""
    import shutil
    import tempfile

    from .streaming.incremental import stream_extract
    from .synth import synth_docs_distributed

    # unique workspace per invocation: concurrent callers (bench +
    # validator) must not rmtree each other's live checkpoints
    base = tempfile.mkdtemp(prefix="german_ocr_spark_q38_")
    inp, out, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    try:
        synth_docs_distributed(spark, 300, seed=11, n_partitions=6).write.parquet(
            inp
        )
        q = stream_extract(spark, inp, out, ck, available_now=True)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("q38 stream did not drain within 300s")
        ex = spark.read.parquet(out)
        summary = _q38_summary(ex)
        # materialize before deleting the workspace the plan reads from
        rows = summary.collect()
        return spark.createDataFrame(rows, schema=summary.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _q38_summary(ex: DataFrame) -> DataFrame:
    return (
        ex.groupBy("kind")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "error_rows"
            ),
            F.xxhash64(
                F.concat_ws(
                    "\x1f",
                    F.sort_array(
                        F.collect_list(F.concat_ws("|", "doc_id", "order", "text"))
                    ),
                )
            ).alias("content_hash"),
        )
        .orderBy("kind")
    )


# =====================================================================
# Flagship: the extraction pipeline itself, oracle-checked
# =====================================================================

@query(
    "q00_extract_pipeline",
    f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 0 AS "order", 'ocr' AS kind,
           {german.normalize_sql('text')} AS text,
           '' AS media_ref, CAST(NULL AS VARCHAR) AS error,
           CAST(NULL AS VARCHAR) AS error_code
    FROM documents
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 1, 'text',
           trim(regexp_replace(text, '\\s+', ' ', 'g')), '', NULL, NULL
    FROM documents
    """,
)
def q00(spark, sf_dir):
    """The flagship mapInPandas extraction pipeline (SURVEY A5/A6/B2/B7/
    B8) run over spans synthesized from the documents table: span 0 is an
    'ocr' span (German normalization kernel), span 1 a whitespace-dirty
    'text' span. The DuckDB oracle recomputes both kernels in SQL, so the
    explode → order → Arrow-batch kernel → output path is value-checked
    end to end."""
    from .operators.extract import extract_pipeline

    d = load(spark, sf_dir, "documents")
    docs = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("ocr").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("  "), F.col("text"), F.lit(" \t")).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(10).alias("offset"),
            ),
        ).alias("spans"),
    )
    return extract_pipeline(docs)


@query(
    "q40_error_taxonomy",
    """
    WITH routed AS (
      SELECT CASE doc_id % 5
               WHEN 0 THEN 'text' WHEN 1 THEN 'html' WHEN 2 THEN 'pdf'
               WHEN 3 THEN 'n8n' ELSE 'ocr'
             END AS kind,
             CASE
               WHEN doc_id % 5 = 1 AND length(text) > 0 THEN 'PARSE_HTML'
               WHEN doc_id % 5 = 2 AND length(text) > 0 THEN 'PARSE_PDF'
               WHEN doc_id % 5 = 3 THEN 'UNKNOWN_KIND'
             END AS error_code
      FROM documents
    )
    SELECT kind, error_code, COUNT(*) AS n_spans
    FROM routed GROUP BY kind, error_code
    """,
)
def q40(spark, sf_dir):
    """A19 typed error taxonomy, oracle-checked: spans are routed to
    kinds by doc_id (including an unknown 'n8n' kind and raw text fed to
    the html/pdf table parsers, which rejects it as malformed), run
    through the real mapInPandas extraction stage, and the resulting
    (kind, error_code) distribution is compared against the closed
    ERROR_CODES domain computed relationally. Mirrors the reference's
    exception-ladder tests (tests/test_cloud_client.py:177-208) as a
    data-level contract: failures are row values with a typed code,
    never task failures."""
    from .operators.extract import extract_pipeline

    d = load(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 5 == 0, "text")
        .when(F.col("doc_id") % 5 == 1, "html")
        .when(F.col("doc_id") % 5 == 2, "pdf")
        .when(F.col("doc_id") % 5 == 3, "n8n")
        .otherwise("ocr")
    )
    docs = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                kind.alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return (
        extract_pipeline(docs)
        .groupBy("kind", "error_code")
        .agg(F.count("*").alias("n_spans"))
    )
