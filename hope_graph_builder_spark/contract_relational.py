"""Relational operator battery (SURVEY.md §2.2-2.7) over the TPC-H-ish
driver tables, each with a DuckDB oracle.

Cross-engine determinism rules used throughout (see oracle.py header):
- float sums → DECIMAL sums cast back to double (exact, order-free)
- ranking → unique-key tie-breaks (row_number deterministic)
- rounding → bround ↔ round_even at ≤5 dp only
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hope_graph_builder_spark import synth
from hope_graph_builder_spark.contract import register


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


# ---------------------------------------------------------------- dedups --

@register(
    "a1_dedup_first",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_a1(spark, sf_dir):
    """A1 first-wins dedup (reference noise_graph_join.py:33) with a
    deterministic order key."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        _orders(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "a2_dedup_max",
    """
    SELECT l_orderkey, max(l_quantity) AS max_qty, max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_a2(spark, sf_dir):
    """A2 dedup-keep-max (reference utils.py:112-141)."""
    return _li(spark, sf_dir).groupBy("l_orderkey").agg(
        F.max("l_quantity").alias("max_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "a5_argmax_set",
    """
    WITH mx AS (SELECT l_orderkey, max(l_quantity) AS mq FROM lineitem GROUP BY l_orderkey)
    SELECT l.l_orderkey,
           array_to_string(list_sort(list(l.l_linenumber)), ',') AS argmax_lines
    FROM lineitem l JOIN mx ON l.l_orderkey = mx.l_orderkey AND l.l_quantity = mx.mq
    GROUP BY l.l_orderkey
    """,
)
def q_a5(spark, sf_dir):
    """A5 row-wise argmax-set (reference utils.py:202-218), set-valued
    output stringified for engine-neutral hashing."""
    li = _li(spark, sf_dir)
    mx = li.groupBy("l_orderkey").agg(F.max("l_quantity").alias("mq"))
    return (
        li.join(mx, "l_orderkey")
        .filter(F.col("l_quantity") == F.col("mq"))
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",", F.transform(F.sort_array(F.collect_list("l_linenumber")),
                                 lambda x: x.cast("string"))
            ).alias("argmax_lines")
        )
    )


@register(
    "a8_quantile_nearest",
    """
    SELECT l_returnflag,
           lst[CAST(floor(0.7 * (len(lst) - 1) + 0.5) AS BIGINT) + 1] AS q70
    FROM (SELECT l_returnflag, list_sort(list(l_quantity)) AS lst
          FROM lineitem GROUP BY l_returnflag)
    """,
)
def q_a8(spark, sf_dir):
    """A8 exact nearest-rank quantile (reference noise_graph_join.py:93,
    pandas interpolation='nearest') — NOT percentile_approx."""
    g = _li(spark, sf_dir).groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("lst")
    )
    idx = (F.floor(F.lit(0.7) * (F.size("lst") - 1) + F.lit(0.5)) + 1).cast("int")
    return g.select("l_returnflag", F.element_at("lst", idx).alias("q70"))


@register(
    "a11_gated_mean",
    """
    SELECT l_orderkey, n,
           CASE WHEN n >= 4 THEN round_even(CAST(s AS DOUBLE) / n, 2) END AS gated_mean
    FROM (SELECT l_orderkey, count(*) AS n,
                 sum(CAST(l_quantity AS DECIMAL(18,4))) AS s
          FROM lineitem GROUP BY l_orderkey)
    """,
)
def q_a11(spark, sf_dir):
    """A11 conditional mean with sample-size gate (reference
    green_view_join_v1.py:56-91); decimal sum → order-independent."""
    g = _li(spark, sf_dir).groupBy("l_orderkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s"),
    )
    return g.select(
        "l_orderkey", "n",
        F.when(F.col("n") >= 4, F.bround(F.col("s").cast("double") / F.col("n"), 2)).alias(
            "gated_mean"
        ),
    )


@register(
    "a12_global_stats",
    """
    SELECT max(o_orderkey) AS max_key, count(DISTINCT o_custkey) AS n_cust,
           count(*) AS n FROM orders
    """,
)
def q_a12(spark, sf_dir):
    """A12 global max/nunique/count (reference noise_graph_join.py:116-120)."""
    return _orders(spark, sf_dir).agg(
        F.max("o_orderkey").alias("max_key"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n"),
    )


@register(
    "a13_histogram",
    "SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem GROUP BY 1, 2",
)
def q_a13(spark, sf_dir):
    return _li(spark, sf_dir).groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    )


@register(
    "a14_mean",
    """
    SELECT round_even(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / count(*), 4)
           AS mean_price
    FROM lineitem
    """,
)
def q_a14(spark, sf_dir):
    """A14 golden-mean oracle (reference test mean 33.20)."""
    return _li(spark, sf_dir).agg(
        F.bround(
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).cast("double") / F.count("*"),
            4,
        ).alias("mean_price")
    )


# ----------------------------------------------------------------- joins --

@register(
    "j6_left_join",
    """
    SELECT o.o_orderstatus, count(*) AS n,
           count(*) FILTER (WHERE c.c_custkey IS NULL) AS n_unmatched
    FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 7 != 0) c
      ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderstatus
    """,
)
def q_j6(spark, sf_dir):
    """J6 equi left join with count invariants (noise_graph_join.py:122-125)."""
    o = _orders(spark, sf_dir)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 7 != 0
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_unmatched"),
        )
    )


@register(
    "j9_lookup_default",
    """
    SELECT l_returnflag, CAST(sum(coalesce(length(p.p_name), -1)) AS BIGINT) AS s
    FROM lineitem l LEFT JOIN (SELECT * FROM part WHERE p_partkey % 3 = 0) p
      ON l.l_partkey = p.p_partkey
    GROUP BY l_returnflag
    """,
)
def q_j9(spark, sf_dir):
    """J9 broadcast lookup with default (reference dict .get default,
    green_view_join_v1.py:138-141)."""
    li = _li(spark, sf_dir)
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_partkey") % 3 == 0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .groupBy("l_returnflag")
        .agg(F.sum(F.coalesce(F.length("p_name"), F.lit(-1))).alias("s"))
    )


@register(
    "j10_id_remap",
    """
    WITH dense AS (
      SELECT n_nationkey, row_number() OVER (ORDER BY n_name) - 1 AS dense_id FROM nation
    )
    SELECT s.s_suppkey, d.dense_id FROM supplier s JOIN dense d
      ON s.s_nationkey = d.n_nationkey
    """,
)
def q_j10(spark, sf_dir):
    """J10 id-remap join (reference otp id dict, otp_graph_import.py:76-83):
    dense ids via row_number, applied by equi-join."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dense = n.withColumn(
        "dense_id", F.row_number().over(Window.orderBy("n_name")) - 1
    ).select("n_nationkey", "dense_id")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return s.join(F.broadcast(dense), s.s_nationkey == dense.n_nationkey).select(
        "s_suppkey", "dense_id"
    )


@register(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def q_topk(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _orders(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


# ------------------------------------------------------------------ sets --

@register(
    "u_union_distinct",
    """
    SELECT DISTINCT k FROM (
      SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier
    )
    """,
)
def q_union(spark, sf_dir):
    """U1/U4 union + distinct (reference U4, otp_graph_import_test.py:32)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").alias("k")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_nationkey").alias("k")
    )
    return c.unionByName(s).distinct()


@register(
    "u_anti_join",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderkey % 5 = 0)
    """,
)
def q_anti(spark, sf_dir):
    """U3 set difference as left_anti (reference graph_export.py:78-79).
    Subtracted side filtered so the result is non-degenerate."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey")


# -------------------------------------------------------- scalar / window --

@register(
    "f11_regex_parse",
    """
    SELECT CAST(regexp_extract(o_orderpriority, '(\\d+)', 1) AS INT) AS prio, count(*) AS cnt
    FROM orders GROUP BY 1
    """,
)
def q_f11(spark, sf_dir):
    """F11 dB-class string parse (reference noise_data_preprocessing.py:118)."""
    return (
        _orders(spark, sf_dir)
        .select(F.regexp_extract("o_orderpriority", r"(\d+)", 1).cast("int").alias("prio"))
        .groupBy("prio")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "f12_bucketing",
    """
    SELECT CASE WHEN l_quantity >= 40 THEN 40 WHEN l_quantity >= 30 THEN 30
                WHEN l_quantity >= 20 THEN 20 WHEN l_quantity >= 10 THEN 10
                ELSE 0 END AS bucket, count(*) AS cnt
    FROM lineitem GROUP BY 1
    """,
)
def q_f12(spark, sf_dir):
    """F12 noise-range bucketing (reference graph_export/utils.py:44-52)."""
    b = (
        F.when(F.col("l_quantity") >= 40, 40)
        .when(F.col("l_quantity") >= 30, 30)
        .when(F.col("l_quantity") >= 20, 20)
        .when(F.col("l_quantity") >= 10, 10)
        .otherwise(0)
    )
    return _li(spark, sf_dir).select(b.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("cnt")
    )


@register(
    "f16_dense_id",
    """
    SELECT l_returnflag, l_linestatus,
           dense_rank() OVER (ORDER BY l_returnflag, l_linestatus) AS way_id
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    """,
)
def q_f16(spark, sf_dir):
    """F16 way-id synthesis via dense_rank (reference graph_export.py:38-43).

    DISTINCT runs FIRST (map-side-combined shuffle over all rows), so
    the unavoidable single-partition global window ranks only the
    handful of distinct keys — never the full table."""
    w = Window.orderBy("l_returnflag", "l_linestatus")
    return (
        _li(spark, sf_dir)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .withColumn("way_id", F.dense_rank().over(w))
    )


@register(
    "f_ring_area_centroid",
    f"""
    WITH p AS ({synth.sql_polylines()}),
    t AS (
      SELECT edge_id, xs, ys, len(xs) AS n,
             list_transform(range(1, len(xs) + 1),
               i -> xs[i] * ys[(i % len(xs)) + 1] - xs[(i % len(xs)) + 1] * ys[i]) AS ct
      FROM p
    ),
    a AS (
      SELECT edge_id, xs, ys, n, ct,
             list_reduce(ct, (u, v) -> u + v) / CAST(2 AS DOUBLE) AS a_signed
      FROM t
    )
    SELECT edge_id,
           abs(list_reduce(ct, (u, v) -> u + v)) / CAST(2 AS DOUBLE) AS ring_area,
           CASE WHEN abs(a_signed) > 1e-9 THEN
             list_reduce(list_transform(range(1, n + 1),
               i -> (xs[i] + xs[(i % n) + 1]) * ct[i]), (u, v) -> u + v)
             / (CAST(6 AS DOUBLE) * a_signed) END AS cx,
           CASE WHEN abs(a_signed) > 1e-9 THEN
             list_reduce(list_transform(range(1, n + 1),
               i -> (ys[i] + ys[(i % n) + 1]) * ct[i]), (u, v) -> u + v)
             / (CAST(6 AS DOUBLE) * a_signed) END AS cy
    FROM a
    """,
)
def q_ring_area_centroid(spark, sf_dir):
    """Native geometry SCALARS over coordinate-array columns: shoelace
    area + centroid as pure Column folds (operators/geometry.
    polygon_area_expr / polygon_centroid_expr) — ring math without WKB
    decode or UDF, inside whole-stage codegen. Oracle = the identical
    sequential folds in DuckDB, so even the centroid doubles match
    bit-for-bit; degenerate rings NULL out under the same float
    guard."""
    from hope_graph_builder_spark.operators.geometry import (
        polygon_area_expr,
        polygon_centroid_expr,
    )

    p = synth.page_polylines(spark, sf_dir)
    cx, cy = polygon_centroid_expr(F.col("xs"), F.col("ys"))
    return p.select(
        "edge_id",
        polygon_area_expr(F.col("xs"), F.col("ys")).alias("ring_area"),
        cx.alias("cx"),
        cy.alias("cy"),
    )


@register(
    "j_interval_join",
    """
    WITH w AS (
      SELECT event_id AS window_id, ts AS start_ts,
             ts + to_seconds(CAST(1000 + event_id * 13 % 5000 AS BIGINT)) AS end_ts
      FROM events WHERE event_id % 17 = 0
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, w.window_id, w.start_ts, w.end_ts
    FROM p JOIN w ON w.start_ts <= p.ts AND p.ts < w.end_ts
    """,
)
def q_interval_join(spark, sf_dir):
    """Interval (range) join via 1-D binning — the temporal analogue
    of the cell-indexed spatial join (operators/temporal.interval_join:
    hour-bin explode + equi-join + containment refine, no
    broadcast-nested-loop). Oracle: the plain inequality join DuckDB
    can afford at this scale."""
    from hope_graph_builder_spark.operators.temporal import interval_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = e.filter(F.col("event_id") % 17 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start_ts"),
        (
            F.col("ts")
            + F.make_interval(
                secs=(F.lit(1000) + F.col("event_id") * 13 % 5000).cast("double")
            )
        ).alias("end_ts"),
    )
    p = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return interval_join(p, w).select(
        "event_id", "user_id", "ts", "window_id", "start_ts", "end_ts"
    )


@register(
    "j_interval_cover",
    """
    WITH w AS (
      SELECT event_id AS window_id, ts AS start_ts,
             ts + to_seconds(CAST(CASE WHEN event_id % 5 = 0
                  THEN 200000 + event_id * 7 % 400000
                  ELSE 1000 + event_id * 13 % 5000 END AS BIGINT)) AS end_ts
      FROM events WHERE event_id % 17 = 0
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, w.window_id, w.start_ts, w.end_ts
    FROM p JOIN w ON w.start_ts <= p.ts AND p.ts < w.end_ts
    """,
)
def q_interval_cover(spark, sf_dir):
    """Interval join under a HEAVY-TAILED interval table (every 5th
    window is 2.3–6.9 DAYS long vs the 17–100-minute typical case —
    56–167 hour-bins each, where the single-level explode would let
    the tail dominate shuffle volume). The cover valve
    (interval_join(max_cover=16)) routes each interval to the
    coarsest-needed level of the bin hierarchy (hour → 8 h → 64 h …),
    bounding every interval's explode at max_cover bins; levels
    union, each interval lives in exactly one level. Oracle: the
    plain inequality join — results must be identical to the
    single-level and valve-free forms."""
    from hope_graph_builder_spark.operators.temporal import interval_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = e.filter(F.col("event_id") % 17 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start_ts"),
        (
            F.col("ts")
            + F.make_interval(
                secs=F.when(
                    F.col("event_id") % 5 == 0,
                    F.lit(200000) + F.col("event_id") * 7 % 400000,
                ).otherwise(
                    F.lit(1000) + F.col("event_id") * 13 % 5000
                ).cast("double")
            )
        ).alias("end_ts"),
    )
    p = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return interval_join(p, w, max_cover=16).select(
        "event_id", "user_id", "ts", "window_id", "start_ts", "end_ts"
    )


@register(
    "j_sample_join",
    """
    WITH a AS (SELECT event_id AS a_id, user_id AS k FROM events
               WHERE event_type = 'click'),
    b AS (SELECT event_id AS b_id, user_id AS k FROM events
          WHERE event_type = 'view'),
    ca AS (SELECT k, count(*) AS ca FROM a GROUP BY k),
    cb AS (SELECT k, count(*) AS cb FROM b GROUP BY k),
    keys AS (
      SELECT ca.k, ca.ca, cb.cb, ca.ca * cb.cb AS p,
             CAST(('0x' || substr(md5(CAST(ca.k AS VARCHAR)), 1, 15))
                  AS BIGINT) % 64 AS kb
      FROM ca JOIN cb USING (k)
    ),
    offs AS (
      SELECT *, coalesce(sum(p) OVER (ORDER BY kb, k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM keys
    ),
    tot AS (SELECT sum(p) AS pt FROM keys),
    idx AS (
      SELECT (j * (pt // 100) + (j * (pt % 100)) // 100)
             + CAST(('0x' || substr(md5('js0#' || CAST(j AS VARCHAR)), 1, 15))
                    AS BIGINT)
               % (((j + 1) * (pt // 100) + ((j + 1) * (pt % 100)) // 100)
                  - (j * (pt // 100) + (j * (pt % 100)) // 100)) AS pos
      FROM generate_series(0, 99) AS t(j), tot
    ),
    hit AS (
      SELECT idx.pos, o.k,
             (idx.pos - o.off) // o.cb AS ia,
             (idx.pos - o.off) % o.cb AS ib
      FROM idx JOIN offs o ON idx.pos >= o.off AND idx.pos < o.off + o.p
    ),
    ra AS (SELECT k, a_id,
                  row_number() OVER (PARTITION BY k ORDER BY a_id) - 1 AS ia
           FROM a),
    rb AS (SELECT k, b_id,
                  row_number() OVER (PARTITION BY k ORDER BY b_id) - 1 AS ib
           FROM b)
    SELECT CAST(hit.pos AS BIGINT) AS idx, hit.k AS user_id, ra.a_id, rb.b_id
    FROM hit
    JOIN ra ON hit.k = ra.k AND hit.ia = ra.ia
    JOIN rb ON hit.k = rb.k AND hit.ib = rb.ib
    """,
)
def q_sample_join(spark, sf_dir):
    """Uniform sampling over a join WITHOUT materializing it
    (operators/join_sample.join_uniform_sample, the
    sampling-over-joins line): 100 systematic-stratified pairs from
    the click×view per-user join. The oracle replays the whole
    bijection — pair counts, bucket-major key offsets, overflow-safe
    stratum indices, grid inversion and the row-rank lookups — so
    every sampled (idx, key, a, b) must match exactly."""
    from hope_graph_builder_spark.operators.join_sample import (
        join_uniform_sample,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"), "user_id"
    )
    b = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("b_id"), "user_id"
    )
    return join_uniform_sample(a, b, "user_id", 100, "a_id", "b_id", salt="js0")


@register(
    "j_props_parse",
    """
    WITH e AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 13 = 0 THEN '{broken' ELSE props END AS props
      FROM events
    ),
    p AS (
      SELECT event_id, event_type,
             CASE WHEN json_valid(props)
                  THEN try_cast(json_extract_string(props, '$.k') AS INT)
             END AS k
      FROM e
    )
    SELECT event_type,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(count(k) AS BIGINT) AS n_parsed,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM p GROUP BY event_type
    """,
)
def q_props_parse(spark, sf_dir):
    """Typed semi-structured extraction (operators/web
    .parse_json_fields): the props JSON bag with every 13th row
    corrupted — extraction must yield NULL (not crash, even under
    ANSI mode) and the typed aggregate must replay exactly, n_parsed
    counting only well-formed rows."""
    from hope_graph_builder_spark.operators.web import parse_json_fields

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 13 == 0, F.lit("{broken"))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    p = parse_json_fields(e, "props", {"k": "int"})
    return p.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("sum_k"),
        F.count("k").cast("long").alias("n_parsed"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "j_sessionize",
    """
    WITH e AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events
    ),
    l AS (
      SELECT event_id, user_id, ts, us,
             lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      FROM e
    )
    SELECT event_id, user_id, ts,
           CAST(sum(CASE WHEN prev IS NULL OR us - prev >= 30000000000
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY us, event_id) - 1
                AS BIGINT) AS session_seq
    FROM l
    """,
)
def q_sessionize(spark, sf_dir):
    """Session assignment (operators/temporal.sessionize): new session
    at every >= 30000 s gap per user (the streaming session_window
    boundary rule), exact integer-microsecond gap arithmetic, ties
    broken by event_id. The oracle replays the lag/cumsum islands —
    every event's session_seq must match."""
    from hope_graph_builder_spark.operators.temporal import sessionize

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    return sessionize(e, gap_seconds=30000)


@register(
    "j_session_stats",
    """
    WITH e AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events
    ),
    l AS (
      SELECT event_id, user_id, ts, us,
             lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      FROM e
    ),
    s AS (
      SELECT user_id, ts, us,
             sum(CASE WHEN prev IS NULL OR us - prev >= 30000000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id) - 1
               AS session_seq
      FROM l
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS ts_start, max(ts) AS ts_end,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
    FROM s GROUP BY 1, 2
    """,
)
def q_session_stats(spark, sf_dir):
    """Per-session rollup (operators/temporal.session_stats): event
    count, exact start/end timestamps and integer-microsecond
    duration per (user, session). The batch twin of a streaming
    session_window aggregation."""
    from hope_graph_builder_spark.operators.temporal import session_stats

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    return session_stats(e, gap_seconds=30000)


@register(
    "j_asof_join",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'view')
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS prev_event_id, r.ts AS prev_ts, r.value AS prev_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (point-in-time): for each click, the latest view by
    the same user at or before it. Engine: the merge-sorted
    union+window re-expression (operators/temporal.asof_join — one
    exchange + one sort, no range blowup); oracle: DuckDB's NATIVE
    ASOF JOIN, a fully independent implementation of the semantics."""
    from hope_graph_builder_spark.operators.temporal import asof_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", "value"
    )
    return asof_join(left, right, by="user_id", payload=["event_id", "ts", "value"])


_GF_LO = 1704412800 // 3600  # 2024-01-05 00:00 UTC, hour bins
_GF_HI = 1704585600 // 3600  # 2024-01-07 00:00 UTC


@register(
    "t_gapfill_locf",
    f"""
    WITH s AS (
      SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bin, ts, event_id, value
      FROM events
      WHERE CAST(floor(epoch(ts) / 3600) AS BIGINT) >= {_GF_LO}
        AND CAST(floor(epoch(ts) / 3600) AS BIGINT) < {_GF_HI}
    ),
    obs AS (
      SELECT user_id, bin, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, bin ORDER BY ts DESC, event_id DESC) AS rn
        FROM s) WHERE rn = 1
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    grid AS (SELECT user_id, unnest(range({_GF_LO}, {_GF_HI})) AS bin FROM keys),
    j AS (
      SELECT g.user_id, g.bin, o.value
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bin = g.bin
    )
    SELECT user_id, CAST(bin * 3600 AS BIGINT) AS bucket_s,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           value IS NOT NULL AS observed
    FROM j
    """,
)
def q_gapfill_locf(spark, sf_dir):
    """Hypertable time_bucket_gapfill + locf (operators/temporal.
    gapfill_locf): every key × every hour bucket of a 2-day literal
    window; a bucket's value is its LAST observation (ts desc,
    event_id desc — total order), empty buckets carry forward, leading
    empties stay NULL. The oracle replays bucketing, the per-bucket
    argmax, the grid, and the IGNORE NULLS carry — row counts
    (keys × buckets exactly), carried values, and the observed flags
    all hash-pinned."""
    from hope_graph_builder_spark.operators.temporal import gapfill_locf

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = gapfill_locf(
        e.select("user_id", "ts", "value", "event_id"),
        by="user_id", ts="ts", value="value", bucket_seconds=3600,
        start_ts="2024-01-05 00:00:00", end_ts="2024-01-07 00:00:00",
        id_col="event_id",
    )
    return out.select(
        "user_id",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        "value_filled",
        "observed",
    )


@register(
    "f18_combined",
    """
    SELECT event_id,
           round_even(coalesce(CASE WHEN event_id % 3 = 0 THEN value / 100.0 END,
                               least(1.0, value / 200.0 + 0.6 * (value / 50.0))), 6) AS combined
    FROM events
    """,
)
def q_f18(spark, sf_dir):
    """F18 combined-GVI formula shape (reference green_view_join_v1.py:94-115):
    coalesce(primary, min(1.0, b + 0.6*c))."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = F.when(F.col("event_id") % 3 == 0, F.col("value") / 100.0)
    return e.select(
        "event_id",
        F.bround(
            F.coalesce(a, F.least(F.lit(1.0), F.col("value") / 200.0 + 0.6 * (F.col("value") / 50.0))),
            6,
        ).alias("combined"),
    )


@register(
    "w_sessionize",
    """
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT user_id,
           CAST(1 + sum(CASE WHEN prev IS NOT NULL AND us - prev > 600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions
    FROM t GROUP BY user_id
    """,
)
def q_sessionize(spark, sf_dir):
    """Sessionization: gap > 10 min starts a new session (lag + cumsum
    pattern; micros-exact cross-engine)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev", F.lag("us").over(w))
        .groupBy("user_id")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.col("prev").isNotNull() & ((F.col("us") - F.col("prev")) > 600_000_000),
                        1,
                    ).otherwise(0)
                )
            ).alias("n_sessions")
        )
    )


@register(
    "w_time_buckets",
    """
    SELECT epoch_us(ts) // 300000000 AS bucket, event_type, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_time_buckets(spark, sf_dir):
    """Windowed aggregation (batch twin of the streaming 5-min window)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
        # integer DIV, not floor(double /): exact like DuckDB's //
        .withColumn("bucket", F.expr("us DIV 300000000"))
        .drop("us")
        .groupBy("bucket", "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
    )


@register(
    "pivot_status",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot (layer-union→pivot is the engine's J1 rewrite; this is the
    generic relational form)."""
    return (
        _li(spark, sf_dir)
        .withColumn("q", F.col("l_quantity").cast("decimal(18,4)"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("q").cast("double"))
    )
