"""Relational-shell operators over the TPC-H-ish tables + events —
the §2.9 categories the reference lacks, expressed Catalyst-first:
broadcast joins for small dims, window dedup (the X5 gen-precedence
analog), sessionization, agg/sort/top-k.

Scale notes (100 TB posture):
- `orders_revenue_by_nation`: customer⨝nation is a BROADCAST join
  (nation is tiny); orders⨝customer shuffles on custkey once; sums
  are map-side partial.
- `events_latest_dedup`: one shuffle on (user_id, event_type) — the
  relational form of the xref generation-precedence upsert
  (XRefTable.java:37-43, SURVEY §2.4 X5).
- `events_sessionize`: one shuffle on user_id, then two window passes
  over the same partitioning (no second shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

SESSION_GAP_MIN = 30


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- aggregation: TPC-H Q1 shape ---------------------------------------


def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


LINEITEM_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- broadcast join: revenue per nation ---------------------------------


def orders_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


ORDERS_REVENUE_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- window dedup (X5 analog) -------------------------------------------


def events_latest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the newest event per (user_id, event_type) — the
    relational form of gen-precedence upsert: row_number over
    (partition key, ORDER BY ts DESC, id DESC) == 1."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


EVENTS_DEDUP_SQL = """
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


# --- sessionization (gaps-and-islands) -----------------------------------


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.withColumn(
        "session_id", F.sum(new_sess).over(w).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_id
"""


# --- tumbling window agg (batch form of the streaming query) -------------


def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window counts per event_type — identical
    logic runs under Structured Streaming in ops/streaming.py
    (readStream + watermark); this batch form is the oracle-checked
    twin."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "v",
        )
    )


EVENTS_WINDOW_SQL = """
SELECT to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))::TIMESTAMP AS win_start,
       event_type, count(*) AS n, round(sum(value), 2) AS v
FROM events
GROUP BY 1, 2
"""


# --- top-k --------------------------------------------------------------


def top_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10).select(
        "doc_id", "n_chars", "lang"
    )


TOP_DOCS_SQL = """
SELECT doc_id, n_chars, lang FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 10
"""


# --- corpus profile (exact agg; sketch variants asserted in pytest) -------


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc counts, char volume, exact
    distinct sources. The approx-sketch twins (approx_count_distinct /
    percentile_approx) run over the same frame in tests/test_ops.py —
    sketches are non-deterministic across engines, so the oracle pins
    the exact forms."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT discrete percentiles of document length —
    the deterministic (oracle-able) twin of the approx sketches:
    percentile_disc picks an actual data value, so Spark and DuckDB
    agree bit-for-bit where percentile_approx would not. One shuffle
    (the groupBy); at corpus scale the per-group sort is the cost,
    which is what the approx sketch trades away."""
    docs = _t(spark, sf_dir, "documents")
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    aggs = [
        F.expr(f"percentile_disc({frac}) WITHIN GROUP (ORDER BY n_chars)")
        .cast("bigint")
        .alias(name)
        for name, frac in qs.items()
    ]
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), *aggs
    ).withColumn("n_docs", F.col("n_docs").cast("bigint"))


CORPUS_QUANTILES_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95
FROM documents GROUP BY lang
"""


CORPUS_PROFILE_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


# --- range join (bucketize + equi-join + filter) --------------------------

RANGE_BUCKET = 10.0


def _ranges_df(spark: SparkSession) -> DataFrame:
    """Deterministic misaligned, overlapping value ranges (the
    dimension side of the range join)."""
    rows = [(i, float((i * 13) % 97), float((i * 13) % 97 + 20)) for i in range(8)]
    return spark.createDataFrame(rows, "range_id int, lo double, hi double")


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.value ∈ [lo, hi) against overlapping ranges — Spark has
    no native range join, and the naive theta-join is a cross product.
    Scale pattern: explode each range into the fixed-width buckets it
    covers, equi-join on bucket(value), then filter exactly. The
    shuffle is on the bucket key; the cross product never materializes
    (cost = events × avg ranges-per-bucket, not events × ranges)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    ranges = _ranges_df(spark)
    exploded = ranges.select(
        "range_id", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / RANGE_BUCKET),
                F.floor((F.col("hi") - 1e-9) / RANGE_BUCKET),
            )
        ).alias("bucket"),
    )
    bucketed = ev.withColumn("bucket", F.floor(F.col("value") / RANGE_BUCKET))
    return (
        bucketed.join(F.broadcast(exploded), "bucket")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .select("event_id", "range_id")
    )


EVENTS_RANGE_JOIN_SQL = """
WITH ranges AS (
  SELECT i AS range_id, CAST((i * 13) % 97 AS DOUBLE) AS lo,
         CAST((i * 13) % 97 + 20 AS DOUBLE) AS hi
  FROM (SELECT unnest(range(8)) AS i)
)
SELECT e.event_id, CAST(r.range_id AS INT) AS range_id
FROM events e JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
"""


def queries():
    return {
        "corpus_profile": corpus_profile,
        "corpus_quantiles": corpus_quantiles,
        "events_range_join": events_range_join,
        "lineitem_pricing_summary": lineitem_pricing_summary,
        "orders_revenue_by_nation": orders_revenue_by_nation,
        "events_latest_dedup": events_latest_dedup,
        "events_sessionize": events_sessionize,
        "events_window_agg": events_window_agg,
        "events_asof_click": events_asof_click,
        "top_documents": top_documents,
    }


def oracles():
    return {
        "corpus_profile": CORPUS_PROFILE_SQL,
        "corpus_quantiles": CORPUS_QUANTILES_SQL,
        "events_range_join": EVENTS_RANGE_JOIN_SQL,
        "lineitem_pricing_summary": LINEITEM_Q1_SQL,
        "orders_revenue_by_nation": ORDERS_REVENUE_SQL,
        "events_latest_dedup": EVENTS_DEDUP_SQL,
        "events_sessionize": EVENTS_SESSIONIZE_SQL,
        "events_window_agg": EVENTS_WINDOW_SQL,
        "events_asof_click": EVENTS_ASOF_SQL,
        "top_documents": TOP_DOCS_SQL,
    }


# --- as-of join (Spark lacks a native one; guide §OLAP patterns) ----------


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for every left row, attach the most recent
    right row (same `by` key, right.ts <= left.ts) via the union+window
    trick — one shuffle on `by`, NO range cross-join:

    tag rows, union, sort within `by` partition by (ts, tag), carry
    right values forward with last_value(ignorenulls), keep left rows.
    Scales as a single window pass; the per-group pandas merge_asof
    alternative needs the same shuffle but leaves the JVM.
    """
    key_cols = {by, ts}
    ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    l_all = left.select(
        *left.columns,
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast("double").alias(f"__r_{c}") for c in value_cols],
    )
    r_all = right.select(
        *[
            (F.col(c) if c in key_cols else F.lit(None).cast(ltypes[c])).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__tag"),
        *[F.col(c).cast("double").alias(f"__r_{c}") for c in value_cols],
    )
    u = l_all.unionByName(r_all)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left.columns,
        "__tag",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__tag") == 1).drop("__tag")


def events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the value of the user's most recent 'click'
    event at-or-before it (as-of semantics over the same stream)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type", "value")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join_latest(
        ev, clicks, by="user_id", ts="ts", value_cols=["click_value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("asof_click_value", 2).alias("last_click_value"),
    )


# Ties: an event AT the same ts as a click sees that click (the right
# row sorts first via __tag), i.e. inclusive as-of; (user_id, ts) is
# unique in the corpus so the window order is deterministic. The
# oracle mirrors inclusivity with <=.
EVENTS_ASOF_SQL = """
SELECT e.event_id, e.user_id,
       round((
         SELECT c.value FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
         ORDER BY c.ts DESC LIMIT 1
       ), 2) AS last_click_value
FROM events e
"""
