"""Remaining built-in surface queries: quantiles, string-function
suite, null-safe equality join, distinct counting, and conditional
expressions — rounding out the engine's general-purpose SQL surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .sources.catalog import load_table
from .queries import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "quantiles",
    sql="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           ROUND(MIN(l_extendedprice), 4) AS min_price,
           ROUND(MAX(l_extendedprice), 4) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_quantiles(spark, sf_dir):
    """Exact continuous quantiles (linear interpolation on order
    statistics — same definition in both engines; rounded to 4
    decimals to absorb interpolation-arithmetic ordering)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


@register(
    "string-funcs",
    sql="""
    SELECT c_custkey,
           CONCAT_WS('|', c_name, c_mktsegment) AS joined,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           REPLACE(c_name, 'Customer', 'Cust') AS replaced,
           levenshtein(c_mktsegment, 'BUILDING') AS seg_distance,
           LEFT(c_name, 4) AS prefix,
           REVERSE(c_mktsegment) AS seg_rev,
           LENGTH(TRIM(c_name)) AS name_len,
           CONTAINS(c_name, '00') AS has_00,
           split_part(c_name, '#', 2) AS name_num
    FROM customer
    """,
)
def q_string_funcs(spark, sf_dir):
    """General string-function surface (concat/pad/replace/edit
    distance/slicing/containment) — all JVM-side codegen."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_distance"),
        F.substring("c_name", 1, 4).alias("prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.length(F.trim("c_name")).alias("name_len"),
        F.contains("c_name", F.lit("00")).alias("has_00"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@register(
    "null-safe-join",
    sql="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderstatus END AS k
      FROM orders
    ), r AS (
      SELECT DISTINCT CASE WHEN o_orderkey % 15 = 0 THEN NULL
                           ELSE o_orderstatus END AS k
      FROM orders
    )
    SELECT l.o_orderkey, l.k
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — required when natural keys can be legitimately
    absent on both sides."""
    o = _t(spark, sf_dir, "orders")
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("k"),
    )
    right = o.select(
        F.when(F.col("o_orderkey") % 15 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("rk")
    ).distinct()
    return left.join(right, left.k.eqNullSafe(right.rk)).select("o_orderkey", "k")


@register(
    "distinct-agg",
    sql="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_distinct_agg(spark, sf_dir):
    """Multiple distinct aggregates in one group-by (expand-based
    plan; each distinct adds one shuffle leg)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "array-ops",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS min_val,
           CAST(list_sort(embedding)[len(embedding)] AS DOUBLE) AS max_val,
           CAST(embedding[3] AS DOUBLE) AS third_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def q_array_ops(spark, sf_dir):
    """First-class array-column manipulation: length, element access,
    sort-based min/max, filtered counts — the nested-type surface
    multimodal schemas rely on."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", F.lit(1)).cast("double").alias("first_val"),
        F.element_at("embedding", F.lit(-1)).cast("double").alias("last_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.element_at("embedding", F.lit(3)).cast("double").alias("third_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "struct-json-ops",
    sql="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type))
             AS packed,
           json_extract(props, '$.k')::BIGINT AS k_value,
           CASE WHEN json_extract(props, '$.k')::BIGINT > 50 THEN 'high'
                ELSE 'low' END AS k_band
    FROM events
    """,
)
def q_struct_json_ops(spark, sf_dir):
    """Struct packing → JSON and JSON-string field extraction (the
    props column of the events stream)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("packed"),
        k.alias("k_value"),
        F.when(k > 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "explode-posexplode",
    sql="""
    SELECT vec_id, (pos - 1) AS pos, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
      WHERE vec_id < 20
    )
    """,
)
def q_explode_posexplode(spark, sf_dir):
    """Array → rows with position (posexplode ≡ unnest WITH
    ORDINALITY) — the pivot from columnar vectors to long format."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))


@register(
    "conditional-agg",
    sql="""
    SELECT n_name,
           CAST(SUM(CASE WHEN o_totalprice > 200000
                         THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE)
             AS big_revenue,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           CAST(AVG(CASE WHEN o_orderstatus = 'O' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)
                AS DOUBLE) AS open_rate
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_conditional_agg(spark, sf_dir):
    """Filtered/conditional aggregation over a dim join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # customer is data-proportional — broadcast left to AQE; nation is
    # a fixed dim
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return j.groupBy("n_name").agg(
        F.sum(
            F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice").cast("decimal(38,6)"))
        )
        .cast("double")
        .alias("big_revenue"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.avg(
            F.when(F.col("o_orderstatus") == "O", F.lit(1.0)).otherwise(F.lit(0.0))
        ).alias("open_rate"),
    )


@register(
    "external-scan-pushdown",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND o_totalprice > 100000
    """,
)
def q_external_scan_pushdown(spark, sf_dir):
    """Incremental scan against an EXTERNAL engine (DuckDB) through
    the Python DataSource pushdown contract — the set-oriented form of
    the reference's warehouse read, which compiles its watermark
    predicate into the remote SQL (fetch_rows, main.py:534-549). Both
    predicates here are accepted by pushFilters and executed by the
    external engine; the Spark plan keeps no post-scan Filter, and the
    columns= projection prunes the remote SELECT list to the four
    consumed columns (asserted in tests/test_external_source.py) —
    never the reference's `SELECT *` (main.py:537)."""
    from .sources.duckdb_source import external_table

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    return (
        external_table(spark, sf_dir, "orders", columns=cols)
        .filter(F.col("o_orderdate") >= "1997-06-01")
        .filter(F.col("o_totalprice") > 100000)
        .select(*cols)
    )


@register(
    "sqlite-scan-pushdown",
    sql="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
    """,
)
def q_sqlite_scan_pushdown(spark, sf_dir):
    """The SQLite connector's driver-facing twin of
    `external-scan-pushdown`: the customer table is staged into a
    SQLite database file at query time (cached, atomic), then read
    back through the JDBC-style rowid-range-partitioned reader with
    both predicates compiled into the remote WHERE (equality + double
    threshold are accepted by pushFilters; the Spark plan keeps no
    post-scan Filter, asserted in tests/test_sqlite_source.py) and the
    SELECT list pruned to the four consumed columns. Models the
    reference's single-warehouse-table read (main.py:534-549) the way
    a 1000-executor job would run it: N independent range slices, each
    on its own connection."""
    from .sources.sqlite_source import sqlite_table_from_parquet

    cols = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]
    df = sqlite_table_from_parquet(spark, sf_dir, "customer", cols, numpartitions=4)
    return (
        df.filter(F.col("c_mktsegment") == "BUILDING")
        .filter(F.col("c_acctbal") > 1000.0)
        .select(*cols)
    )


@register(
    "hll-sketch-merge",
    sql="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS within_tolerance
    FROM orders
    """,
)
def q_hll_sketch_merge(spark, sf_dir):
    """Mergeable distinct-count sketches: one HLL sketch per order
    month (the shape of a partitioned/incremental pipeline), unioned
    into the global estimate WITHOUT re-scanning rows — how distinct
    counts compose across days/partitions at 100 TB. Oracle checks the
    exact count plus a 5%-tolerance flag on the merged estimate (the
    sketch itself is engine-specific)."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return exact.crossJoin(merged).select(
        "exact_distinct",
        (
            F.abs(F.col("merged_estimate") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_tolerance"),
    )


@register(
    "fk-orphans",
    sql="""
    SELECT 'orders->customer' AS fk, COUNT(*) AS n_orphans
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey IS NULL
    """,
)
def q_fk_orphans(spark, sf_dir):
    """Referential-integrity audit: orphaned child rows per foreign
    key (anti-join counts) — the first gate of a data-quality sweep
    before training-data assembly."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    a = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("orders->customer").alias("fk"), "n_orphans")
    )
    b = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("lineitem->orders").alias("fk"), "n_orphans")
    )
    return a.unionByName(b)


@register(
    "dq-audit",
    sql="""
    SELECT 'customer' AS tbl,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_name IS NULL OR trim(c_name) = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS blank_names,
           CAST(SUM(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS acctbal_out_of_range,
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS duplicate_keys,
           CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_nations
    FROM customer
    """,
)
def q_dq_audit(spark, sf_dir):
    """Single-pass table-quality audit: blank/null rates, range
    violations, key uniqueness — one aggregate scan per table, no
    per-check re-reads (every metric is a conditional sum in the same
    HashAggregate)."""
    c = _t(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("c_name").isNull() | (F.trim("c_name") == ""), 1).otherwise(0)
        ).cast("long").alias("blank_names"),
        F.sum(
            F.when((F.col("c_acctbal") < -1000) | (F.col("c_acctbal") > 10000), 1)
            .otherwise(0)
        ).cast("long").alias("acctbal_out_of_range"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).cast("long").alias(
            "duplicate_keys"
        ),
        F.sum(F.when(F.col("c_nationkey").isNull(), 1).otherwise(0)).cast("long").alias(
            "null_nations"
        ),
    ).select(F.lit("customer").alias("tbl"), "n_rows", "blank_names",
             "acctbal_out_of_range", "duplicate_keys", "null_nations")


@register(
    "rank-funcs",
    sql="""
    SELECT event_id, event_type,
           DENSE_RANK() OVER w AS drank,
           NTILE(10) OVER w AS decile,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           ROUND(CUME_DIST() OVER w, 6) AS cdist
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def q_rank_funcs(spark, sf_dir):
    """The ranked-window function family in one pass: dense_rank,
    decile bucketing (ntile), percent_rank, cume_dist — the quantile-
    bucketing primitives behind score normalization and percentile
    features. One window shuffle on event_type; (value, event_id) is a
    total order, so every rank is deterministic, and percent_rank/
    cume_dist are exact rationals of row counts — identical doubles in
    both engines before the 6-decimal round."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "stats-agg",
    sql="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))
               AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6)))
               AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))
               AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS qty_stddev,
           ROUND((sxy - sx * sy / n) / (n - 1), 4) AS qty_price_covar,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS qty_price_corr
    FROM m
    """,
)
def q_stats_agg(spark, sf_dir):
    """Second-moment statistics (sample stddev / covariance / Pearson
    correlation) computed from DECIMAL-EXACT raw moments rather than
    Spark's built-in co-moment aggregates: the built-ins merge partial
    co-moments in partition order, so their last ulps are
    partition-schedule-dependent — unusable under a bit-exact oracle.
    Exact integer/decimal sums of x, y, x², y², xy are
    order-independent; both engines then evaluate the identical
    closed-form double expression. One map-side partial + final hash
    aggregation — the same single-shuffle profile as any groupBy, and
    the moment algebra is how a 1000-executor job computes correlation
    anyway (Welford-style streaming merges trade determinism for one
    fewer pass; with exact sums the pass count is identical)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec(q).alias("sx"),
        dec(p).alias("sy"),
        dec(q * q).alias("sxx"),
        dec(p * p).alias("syy"),
        dec(q * p).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("qty_stddev"),
        F.round((sxy - sx * sy / n) / (n - 1), 4).alias("qty_price_covar"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("qty_price_corr"),
    )
