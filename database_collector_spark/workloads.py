"""Driver-facing query workloads: every operator from SURVEY.md §2 expressed
over the /root/testdata tables, each with a DuckDB-runnable oracle twin.

Conventions that make the DuckDB value-hash gate deterministic:

* Money columns in the testdata are 2-decimal exact, so aggregates use
  integer-cents arithmetic (``CAST(ROUND(x*100) AS BIGINT)``), summed in
  DECIMAL when products can approach int64 range, and only converted to
  DOUBLE as the final step. Bit-identical across engines.
* Every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing).
* No wall-clock: ``now()`` semantics use a fixed anchor timestamp.

Each query's docstring cites the reference behavior it re-expresses
(file:line in /root/reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QueryFn = Callable[[SparkSession, str], DataFrame]

ANCHOR_TS = "2001-09-01 00:00:00"  # deterministic stand-in for SYSDATE/now()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated table.

    ``events.parquet`` has shipped with two generations of ``ts`` physical
    type: TIMESTAMP(NANOS) (which Spark's parquet reader surfaces only via
    ``nanosAsLong``) and plain TIMESTAMP(MICROS). Adapt to whichever this
    fixture carries so queries always see a microsecond timestamp column
    (nanos truncate — matching how DuckDB surfaces the same column).
    """
    if name == "events":
        # session.py sets nanosAsLong at build time; guard here only for
        # foreign sessions (the external driver may construct its own) and
        # skip the mutation when the conf is already in effect.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes)["ts"] == "bigint":  # nanos surfaced as long
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        df = _fan_out(df)
    return df


def _fan_out(df: DataFrame) -> DataFrame:
    """Spread an under-split scan across the cluster.

    The driver fixtures are single-row-group parquet files, so the scan
    yields 1 input split and every downstream per-row computation runs on
    one core. A 100 TB table arrives in thousands of splits and never hits
    this; the repartition reproduces that natural layout locally (and is a
    no-op decision at scale: it only fires when the source has fewer
    splits than the cluster has slots). Applied to the per-row-compute
    tables (documents, embeddings) where hashing/linear-algebra work
    dwarfs the one-extra-pass shuffle; aggregation-shaped tables skip it —
    partial aggregation already collapses their rows before any exchange.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _cents(c: str) -> F.Column:
    """2-dp-exact double -> integer cents (engine-independent)."""
    return F.round(F.col(c) * 100).cast("long")


# ---------------------------------------------------------------------------
# Reference-parity workloads (SURVEY.md §2)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan->filter->groupBy->agg (SURVEY §2.5 A4 class).

    TPC-H-Q1-shaped pricing summary over lineitem. The shape matches the
    upstream scrapers' aggregation surface (COUNT/SUM GROUP BY — e.g. the
    v$session counts enabled via collector/exporters/oracle/oracle-exporter.go:22).
    Catalyst pushes the shipdate filter and column pruning into the parquet
    scan; partial aggregation keeps the shuffle at |groups| not |rows|.
    """
    li = _t(spark, sf_dir, "lineitem")
    qty = _cents("l_quantity")
    price = _cents("l_extendedprice")
    disc = F.round(F.col("l_discount") * 100).cast("long")  # basis points /100
    tax = F.round(F.col("l_tax") * 100).cast("long")
    disc_price = (price * (100 - disc)).cast("decimal(38,0)")
    charge = (price * (100 - disc) * (100 + tax)).cast("decimal(38,0)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / 100).alias("sum_qty"),
            (F.sum(price).cast("double") / 100).alias("sum_base_price"),
            (F.sum(disc_price).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / 1000000).alias("sum_charge"),
            (F.sum(qty).cast("double") / 100 / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / 100 / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / 100 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
       CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE)/10000 AS sum_disc_price,
       CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                * (100 + CAST(ROUND(l_tax*100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE)/1000000 AS sum_charge,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*) AS avg_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*) AS avg_price,
       CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_long_running_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one first-party SQL query, re-expressed (SURVEY §2.9).

    collector/exporters/oracle/custom-metrics.toml:4-16 — scan -> derived
    duration column (date arithmetic, F6) -> IS NOT NULL + threshold + LIKE
    conjunctive filter (P5) -> ORDER BY DESC. Mapped onto ``orders`` with a
    fixed anchor replacing SYSDATE: duration_hours since o_orderdate, rows
    with priority LIKE '1%' held longer than 10000 hours.
    """
    orders = _t(spark, sf_dir, "orders")
    dur = F.round(
        (
            F.unix_timestamp(F.lit(ANCHOR_TS).cast("timestamp"))
            - F.unix_timestamp(F.col("o_orderdate"))
        )
        / F.lit(3600.0),
        2,
    )
    return (
        orders.withColumn("session_duration_hours", dur)
        .filter(
            F.col("o_orderpriority").isNotNull()
            & (F.col("session_duration_hours") > 10000)
            & F.col("o_orderpriority").like("1%")
        )
        .select(
            F.col("o_orderkey").alias("sid"),
            F.col("o_custkey").alias("serial"),
            F.col("o_orderpriority").alias("username"),
            "session_duration_hours",
        )
        .orderBy(F.desc("session_duration_hours"), "sid")
    )


SQL_LONG_RUNNING_SESSIONS = f"""
SELECT o_orderkey AS sid, o_custkey AS serial, o_orderpriority AS username,
       ROUND(date_diff('second', o_orderdate, TIMESTAMP '{ANCHOR_TS}')/3600.0, 2)
         AS session_duration_hours
FROM orders
WHERE o_orderpriority IS NOT NULL
  AND ROUND(date_diff('second', o_orderdate, TIMESTAMP '{ANCHOR_TS}')/3600.0, 2) > 10000
  AND o_orderpriority LIKE '1%'
ORDER BY session_duration_hours DESC, sid
"""


def q_grouped_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events counter keyed by labels, with the len==1 -> 'none' quirk.

    collector/cmd/events-collector/events-collector.go:22-28,43-47 — the
    running grouped count (A1) plus presence-check quirk (P7): a 1-char
    EventID is replaced by the literal label 'none'.
    """
    ev = _t(spark, sf_dir, "events")
    label = F.when(F.length(F.col("user_id").cast("string")) == 1, F.lit("none")).otherwise(
        F.col("user_id").cast("string")
    )
    return (
        ev.withColumn("event_label", label)
        .groupBy("event_label", "event_type")
        .agg(F.count("*").alias("n"))
    )


SQL_GROUPED_COUNTER = """
SELECT CASE WHEN length(CAST(user_id AS VARCHAR)) = 1 THEN 'none'
            ELSE CAST(user_id AS VARCHAR) END AS event_label,
       event_type, COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


def q_registry_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-registry refresh diff as anti-joins (SURVEY §2.3 J1).

    collector/cmd/collector/database-collector.go:91-166 — adds = current
    minus previous, removes = previous minus current, on the registry key.
    Emulated over orders: 'previous' registry = customers active before
    1997, 'current' = active 1996+. Anti-joins avoid a full shuffle of the
    wide side and broadcast when one snapshot is small.
    """
    orders = _t(spark, sf_dir, "orders")
    prev = (
        orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    curr = (
        orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    adds = curr.join(prev, "o_custkey", "left_anti").withColumn("action", F.lit("add"))
    removes = prev.join(curr, "o_custkey", "left_anti").withColumn(
        "action", F.lit("remove")
    )
    return adds.unionByName(removes)


SQL_REGISTRY_DIFF = """
WITH prev AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
     curr AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
SELECT o_custkey, 'add' AS action FROM (SELECT o_custkey FROM curr EXCEPT SELECT o_custkey FROM prev)
UNION ALL
SELECT o_custkey, 'remove' AS action FROM (SELECT o_custkey FROM prev EXCEPT SELECT o_custkey FROM curr)
"""


def q_engine_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-alias normalization + unknown-engine skip (SURVEY §2.2 P2, §2.6).

    collector/cmd/collector/database-collector.go:60-70 routes engine names
    through an alias map ('oracle'|'oracle-ee'|'custom-oracle-ee' -> oracle)
    and warn-skips unknown engines. Same shape: event_type routed through an
    alias CASE, unknowns filtered out, counted per route.
    """
    ev = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").isin("click", "view"), F.lit("web"))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit("commerce"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        ev.withColumn("route", route)
        .filter(F.col("route").isNotNull())
        .groupBy("route")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_engines"),
        )
    )


SQL_ENGINE_DISPATCH = """
SELECT route, COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_engines
FROM (
  SELECT CASE WHEN event_type IN ('click','view') THEN 'web'
              WHEN event_type IN ('purchase','signup') THEN 'commerce'
              ELSE NULL END AS route, event_type
  FROM events
) WHERE route IS NOT NULL
GROUP BY route
"""


def q_engine_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warn-skip side of engine dispatch (SURVEY §2.2 P2).

    collector/cmd/collector/database-collector.go:67-69 logs-and-skips
    targets whose engine has no route; ``sources.registry.rejects`` is the
    operator form. Same shape here: the event_types the alias CASE of
    q_engine_dispatch does NOT route, counted — exactly what the reference
    would emit as warning lines.
    """
    ev = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").isin("click", "view"), F.lit("web"))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit("commerce"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        ev.withColumn("route", route)
        .filter(F.col("route").isNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n_skipped"))
    )


SQL_ENGINE_REJECTS = """
SELECT event_type, COUNT(*) AS n_skipped
FROM (
  SELECT CASE WHEN event_type IN ('click','view') THEN 'web'
              WHEN event_type IN ('purchase','signup') THEN 'commerce'
              ELSE NULL END AS route, event_type
  FROM events
) WHERE route IS NULL
GROUP BY event_type
"""


def q_kv_numeric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K/V catalog rows -> numeric parse, non-numeric dropped (SURVEY §1.1).

    Mirrors the SHOW GLOBAL STATUS handling the reference enables at
    collector/exporters/mysql/mysql-exporter.go:13-14: dynamically-typed
    (name, value-string) pairs; numeric parse attempted, non-numeric rows
    dropped. Here the K/V surface is the events.props JSON plus a
    deliberately non-numeric pair from event_type.
    """
    ev = _t(spark, sf_dir, "events")
    kv = ev.select(
        F.col("event_id"),
        F.explode(
            F.create_map(
                F.lit("k"),
                F.get_json_object(F.col("props"), "$.k"),
                F.lit("type"),
                F.col("event_type"),
            )
        ).alias("variable_name", "variable_value"),
    )
    # try_cast, not cast: ANSI mode would raise on non-numeric strings, and
    # the reference's semantics are "attempt numeric parse, drop failures"
    parsed = kv.withColumn("num_value", F.col("variable_value").try_cast("double")).filter(
        F.col("num_value").isNotNull()
    )
    return parsed.groupBy("variable_name").agg(
        F.count("*").alias("n_samples"),
        F.sum(F.col("num_value").cast("long")).alias("sum_value"),
    )


SQL_KV_NUMERIC_PARSE = """
SELECT variable_name, COUNT(*) AS n_samples,
       CAST(SUM(CAST(TRY_CAST(variable_value AS DOUBLE) AS BIGINT)) AS BIGINT) AS sum_value
FROM (
  SELECT event_id, 'k' AS variable_name, json_extract_string(props, '$.k') AS variable_value FROM events
  UNION ALL
  SELECT event_id, 'type' AS variable_name, event_type AS variable_value FROM events
)
WHERE TRY_CAST(variable_value AS DOUBLE) IS NOT NULL
GROUP BY variable_name
"""


def q_label_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core enrichment transform, flat-column form (SURVEY §2.4).

    collector/internal/utils/prometheus.go:22-120: per sample carry the
    metric name, derive identifier = host split at first '.'
    (prometheus.go:48), stamp job/region/accountId/engine labels, and fall
    back to a fixed timestamp when the sample has none (prometheus.go:27-32;
    anchored here for determinism). Pure narrow transform — no shuffle.
    """
    ev = _t(spark, sf_dir, "events")
    host = F.concat_ws(
        ".", F.col("event_type"), (F.col("user_id") % 4).cast("string"), F.lit("example.com")
    )
    ts_maybe = F.when(F.col("event_id") % 100 == 0, F.lit(None).cast("timestamp")).otherwise(
        F.col("ts")
    )
    return ev.select(
        F.concat(F.lit("events_"), F.col("event_type")).alias("name"),
        F.split(host, "\\.").getItem(0).alias("identifier"),
        F.lit("database-collector").alias("job"),
        F.lit("us-west-2").alias("region"),
        F.lit("123456789012").alias("account_id"),
        F.lit("NA").alias("engine"),
        F.col("value"),
        F.coalesce(ts_maybe, F.lit(ANCHOR_TS).cast("timestamp")).alias("ts_out"),
        F.col("event_id"),
    )


SQL_LABEL_ENRICH = f"""
SELECT 'events_' || event_type AS name,
       split_part(event_type || '.' || CAST(user_id % 4 AS VARCHAR) || '.example.com', '.', 1) AS identifier,
       'database-collector' AS job,
       'us-west-2' AS region,
       '123456789012' AS account_id,
       'NA' AS engine,
       value,
       COALESCE(CASE WHEN event_id % 100 = 0 THEN NULL ELSE ts END,
                TIMESTAMP '{ANCHOR_TS}') AS ts_out,
       event_id
FROM events
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number (SURVEY §2.7 extension surface).

    The reference has no window functions; at 100 TB top-k must be a
    partitioned window (never a driver-side collect) — rank within
    o_orderpriority by totalprice, deterministic tie-break on key.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .filter(F.col("rank_in_priority") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank_in_priority")
    )


SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank_in_priority
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_priority
  FROM orders
) WHERE rank_in_priority <= 3
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT surface (SURVEY §2.7: the refresh diff is EXCEPT
    both ways, database-collector.go:97-166)."""
    part = _t(spark, sf_dir, "part")
    small = part.filter(F.col("p_size") == 1).select("p_brand", "p_type").distinct()
    large = part.filter(F.col("p_size") == 41).select("p_brand", "p_type").distinct()
    only_small = small.exceptAll(large).withColumn("op", F.lit("only_small"))
    both = small.intersect(large).withColumn("op", F.lit("both"))
    return only_small.unionByName(both)


SQL_SET_OPS = """
WITH small AS (SELECT DISTINCT p_brand, p_type FROM part WHERE p_size = 1),
     large AS (SELECT DISTINCT p_brand, p_type FROM part WHERE p_size = 41)
SELECT p_brand, p_type, 'only_small' AS op FROM (SELECT * FROM small EXCEPT SELECT * FROM large)
UNION ALL
SELECT p_brand, p_type, 'both' AS op FROM (SELECT * FROM small INTERSECT SELECT * FROM large)
"""


def q_limit_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic page cap (SURVEY §2.7: MaxResults 100 on the secrets
    list, secrets-manager.go:33). ORDER BY unique key makes LIMIT stable."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.orderBy("c_custkey")
        .limit(100)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_LIMIT_CAP = """
SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey LIMIT 100
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k (extension join coverage, SURVEY §2.3 note).

    customer ⋈ orders ⋈ lineitem with revenue ranking. customer is small at
    every SF relative to lineitem — broadcast it; orders⋈lineitem shuffles
    on the join key, and AQE handles skew at scale.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    price = _cents("l_extendedprice")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    revenue_cents = (price * (100 - disc)).cast("decimal(38,0)")
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(revenue_cents).cast("double") / 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE)/10000 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Registry assembly
# ---------------------------------------------------------------------------

QUERIES: dict[str, QueryFn] = {
    "pricing_summary": q_pricing_summary,
    "long_running_sessions": q_long_running_sessions,
    "grouped_counter": q_grouped_counter,
    "registry_diff": q_registry_diff,
    "engine_dispatch": q_engine_dispatch,
    "engine_rejects": q_engine_rejects,
    "kv_numeric_parse": q_kv_numeric_parse,
    "label_enrich": q_label_enrich,
    "topk_per_group": q_topk_per_group,
    "set_ops": q_set_ops,
    "limit_cap": q_limit_cap,
    "shipping_priority": q_shipping_priority,
}

ORACLES: dict[str, str] = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "long_running_sessions": SQL_LONG_RUNNING_SESSIONS,
    "grouped_counter": SQL_GROUPED_COUNTER,
    "registry_diff": SQL_REGISTRY_DIFF,
    "engine_dispatch": SQL_ENGINE_DISPATCH,
    "engine_rejects": SQL_ENGINE_REJECTS,
    "kv_numeric_parse": SQL_KV_NUMERIC_PARSE,
    "label_enrich": SQL_LABEL_ENRICH,
    "topk_per_group": SQL_TOPK_PER_GROUP,
    "set_ops": SQL_SET_OPS,
    "limit_cap": SQL_LIMIT_CAP,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
}
