"""Driver-contract implementation: queries() + oracle_sql() pairs.

Each query is a (spark, sf_dir) -> DataFrame callable; each oracle is
DuckDB SQL over the same parquet views producing identical rows
(column names aliased identically on both sides — the driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hope_graph_builder_spark import oracle, synth
from hope_graph_builder_spark.operators.noise import (
    SOURCES,
    edge_db_rows,
    edge_source_rows,
)
from hope_graph_builder_spark.operators.sampling import sample_edges
from hope_graph_builder_spark.operators.spatial_join import (
    dwithin_join,
    dwithin_polyline_join,
    pip_join_rect,
    with_point_cell,
)
from hope_graph_builder_spark.pipelines.noise_join import noise_final_samples
from hope_graph_builder_spark.spatial.cells import cell_size

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return deco


def _last_green_round() -> dict[str, int]:
    """name → most recent round in which the DRIVER verified the query
    green (rows+schema+hash), read from the committed
    CORRECTNESS_r*.json files. Mechanical input to the window rotation
    below; a query that failed (or errored) in a round does NOT count
    as verified there, so regressions float back into the window."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    seen: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r0*(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, v in data.items():
            if not isinstance(v, dict):
                continue
            ok = bool(v.get("rows_match")) and v.get("err") is None and (
                v.get("hash_match") is not False
            )
            if ok:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def _fingerprint(name: str) -> str:
    """Content identity of a query: oracle SQL + implementation source.
    A query whose fingerprint no longer matches the one recorded at its
    last in-window verification is treated as NEVER VERIFIED — edits to
    a demoted query cannot hide behind its old green result."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(_QUERIES[name])
    except (OSError, TypeError):
        src = name
    return hashlib.md5((_ORACLES.get(name, "") + src).encode()).hexdigest()[:16]


def _recorded_fingerprints() -> dict[str, str]:
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parents[1] / "contract_fingerprints.json"
    try:
        return json.loads(p.read_text())
    except (OSError, ValueError):
        return {}


def queries() -> dict[str, QueryFn]:
    """All registered queries, ordered LEAST-RECENTLY-DRIVER-VERIFIED
    first. The external gate records the first 50 entries; with more
    than 50 registered queries this round-robin guarantees every query
    re-enters the externally-verified window within
    ceil(total/50) rounds — never-verified, regressed and EDITED
    queries (fingerprint mismatch vs contract_fingerprints.json, the
    state recorded when they were last in-window) sort to the very
    front. Selection is mechanical (derived from the committed
    CORRECTNESS_r*.json files + fingerprints), not discretionary; ALL
    queries are additionally verified locally every round via
    tools/check_contract.py. Policy documented in COVERAGE.md."""
    names = list(_QUERIES)
    try:
        seen = _last_green_round()
        recorded = _recorded_fingerprints()
        for n in names:
            if recorded and recorded.get(n) != _fingerprint(n):
                seen[n] = 0
    except Exception:
        seen = {}
    order = sorted(range(len(names)), key=lambda i: (seen.get(names[i], 0), i))
    return {names[i]: _QUERIES[names[i]] for i in order}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# --------------------------------------------------------------- helpers --

def _final_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = synth.page_edges(spark, sf_dir)
    layers = synth.noise_layers(spark)
    return noise_final_samples(edges, layers, synth.NODATA_RECT, res=7)


# ------------------------------------------------ flagship spatial joins --

@register("noise_exposures", oracle.sql_noise_exposures())
def q_noise_exposures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship J1/A2/A3-A6/J12/A7: per-edge dB exposure rows."""
    return edge_db_rows(_final_samples(spark, sf_dir))


@register("noise_source_counts", oracle.sql_noise_source_counts())
def q_noise_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edge_source_rows(_final_samples(spark, sf_dir))


@register("location_exposures", oracle.sql_location_exposures())
def q_location_exposures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused dedup+PIP+pivot core in isolation (pipelines.
    noise_join.location_exposures) — the exact stage the streaming
    twin (streaming/noise_stream.py) maintains incrementally.
    Unmatched locations must survive the left cell-join with all-null
    layer columns; the oracle's `pts` LEFT JOIN mirrors that."""
    from hope_graph_builder_spark.operators.noise import LAYER_NAMES
    from hope_graph_builder_spark.operators.sampling import sample_edges, with_xy_id
    from hope_graph_builder_spark.pipelines.noise_join import location_exposures

    edges = synth.page_edges(spark, sf_dir)
    layers = synth.noise_layers(spark)
    lex = location_exposures(with_xy_id(sample_edges(edges)), layers, res=7)
    return lex.select(
        "xy_id", *[F.col(c).cast("long").alias(c) for c in LAYER_NAMES]
    )


@register("noise_main_source", oracle.sql_noise_main_source())
def q_noise_main_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    final = _final_samples(spark, sf_dir)
    src_rows = edge_source_rows(final)
    prio = F.array_position(F.array(*[F.lit(s) for s in SOURCES]), F.col("src"))
    mode = src_rows.groupBy("edge_id").agg(
        F.max_by("src", F.struct(F.col("cnt"), (-prio).alias("p"))).alias("noise_source")
    )
    return (
        final.select("edge_id").distinct()
        .join(mode, "edge_id", "left")
        .select("edge_id", F.coalesce("noise_source", F.lit("")).alias("noise_source"))
    )


@register(
    "point_cells",
    f"""
    WITH pts AS ({synth.sql_points()})
    SELECT doc_id,
           (9 * 72057594037927936 /* 9 << 56 */)
           + CAST(floor(x / {cell_size(9)}) AS BIGINT) * 268435456
           + CAST(floor(y / {cell_size(9)}) AS BIGINT) AS cell
    FROM pts
    """,
)
def q_point_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile assignment: exact cell id per page point (north-rule
    'exact tile/cell assignments per geometry')."""
    pts = synth.page_points(spark, sf_dir)
    return with_point_cell(pts, "x", "y", res=9, out="cell").select("doc_id", "cell")


@register(
    "pip_point_layers",
    f"""
    WITH pts AS ({synth.sql_points()}),
         layers AS ({synth.sql_layers_duckdb()})
    SELECT p.doc_id, l.layer, max(l.db) AS max_db
    FROM pts p JOIN layers l
      ON p.x >= l.minx AND p.x < l.maxx AND p.y >= l.miny AND p.y < l.maxy
    GROUP BY p.doc_id, l.layer
    """,
)
def q_pip_point_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 core: page points × noise polygons, max dB per layer."""
    pts = synth.page_points(spark, sf_dir)
    layers = synth.noise_layers(spark)
    m = pip_join_rect(pts, layers, res=9, how="inner", point_id="doc_id")
    return m.groupBy("doc_id", "layer").agg(F.max("db").alias("max_db"))


@register(
    "pip_sample_join",
    f"""
    WITH pts AS ({{PTS}}),
    a AS (
      SELECT doc_id AS a_id, x, y,
             (9 * 72057594037927936)
             + CAST(floor(x / 256.0) AS BIGINT) * 268435456
             + CAST(floor(y / 256.0) AS BIGINT) AS kk
      FROM pts
    ),
    lay AS ({{LAYERS}}),
    lx AS (SELECT *, unnest(range(CAST(floor(minx / 256.0) AS BIGINT),
                                  CAST(floor(maxx / 256.0) AS BIGINT) + 1))
                     AS ix FROM lay),
    lc AS (SELECT *, unnest(range(CAST(floor(miny / 256.0) AS BIGINT),
                                  CAST(floor(maxy / 256.0) AS BIGINT) + 1))
                     AS iy FROM lx),
    b AS (SELECT poly_id AS b_id,
                 (9 * 72057594037927936) + ix * 268435456 + iy AS kk
          FROM lc),
    ca AS (SELECT kk, count(*) AS ca FROM a GROUP BY kk),
    cb AS (SELECT kk, count(*) AS cb FROM b GROUP BY kk),
    keys AS (
      SELECT ca.kk, ca.ca, cb.cb, ca.ca * cb.cb AS p,
             CAST(('0x' || substr(md5(CAST(ca.kk AS VARCHAR)), 1, 15))
                  AS BIGINT) % 64 AS kb
      FROM ca JOIN cb USING (kk)
    ),
    offs AS (
      SELECT *, coalesce(sum(p) OVER (ORDER BY kb, kk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM keys
    ),
    tot AS (SELECT sum(p) AS pt FROM keys),
    idx AS (
      SELECT (j * (pt // 240) + (j * (pt % 240)) // 240)
             + CAST(('0x' || substr(md5('ps0#' || CAST(j AS VARCHAR)), 1, 15))
                    AS BIGINT)
               % (((j + 1) * (pt // 240) + ((j + 1) * (pt % 240)) // 240)
                  - (j * (pt // 240) + (j * (pt % 240)) // 240)) AS pos
      FROM generate_series(0, 239) AS t(j), tot
    ),
    hit AS (
      SELECT idx.pos, o.kk,
             (idx.pos - o.off) // o.cb AS ia,
             (idx.pos - o.off) % o.cb AS ib
      FROM idx JOIN offs o ON idx.pos >= o.off AND idx.pos < o.off + o.p
    ),
    ra AS (SELECT kk, a_id, x, y,
                  row_number() OVER (PARTITION BY kk ORDER BY a_id) - 1 AS ia
           FROM a),
    rb AS (SELECT kk, b_id,
                  row_number() OVER (PARTITION BY kk ORDER BY b_id) - 1 AS ib
           FROM b),
    cand AS (
      SELECT hit.pos, ra.a_id, ra.x, ra.y, rb.b_id
      FROM hit
      JOIN ra ON hit.kk = ra.kk AND hit.ia = ra.ia
      JOIN rb ON hit.kk = rb.kk AND hit.ib = rb.ib
    ),
    acc AS (
      SELECT cand.* FROM cand JOIN lay ON cand.b_id = lay.poly_id
      WHERE cand.x >= lay.minx AND cand.x < lay.maxx
        AND cand.y >= lay.miny AND cand.y < lay.maxy
    )
    SELECT CAST(pos AS BIGINT) AS idx, a_id AS doc_id, b_id AS poly_id FROM (
      SELECT *, row_number() OVER (ORDER BY
        CAST(('0x' || substr(md5('ps0!' || CAST(pos AS VARCHAR)), 1, 15))
             AS BIGINT), pos) AS r
      FROM acc) z
    WHERE r <= 60
    """.replace("{PTS}", synth.sql_points())
       .replace("{LAYERS}", synth.sql_layers_duckdb()),
)
def q_pip_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform sampling over the SPATIAL join without materializing it
    (operators/join_sample.pip_rect_uniform_sample, the ICDE'25
    spatial range-join sampling shape): 240 candidates from the cell
    pair-grid bijection, containment rejection, 60 accepted pairs in
    salted-hash order. The oracle replays cells, covers, the full
    bijection, the rejection and the hash-order cut."""
    from hope_graph_builder_spark.operators.join_sample import (
        pip_rect_uniform_sample,
    )

    pts = synth.page_points(spark, sf_dir).select("doc_id", "x", "y")
    layers = synth.noise_layers(spark)
    return pip_rect_uniform_sample(
        pts, layers, k=60, res=9, rect_id="poly_id", oversample=4, salt="ps0"
    )


@register(
    "dwithin_sample_join",
    f"""
    WITH pts AS ({{PTS}}),
    edges AS ({{EDGES}}),
    a AS (
      SELECT doc_id AS a_id, x, y,
             (11 * 72057594037927936)
             + CAST(floor(x / 64.0) AS BIGINT) * 268435456
             + CAST(floor(y / 64.0) AS BIGINT) AS kk
      FROM pts
    ),
    eb AS (SELECT edge_id, x1, y1, x2, y2,
                  least(x1, x2) - 30.0 AS minx, greatest(x1, x2) + 30.0 AS maxx,
                  least(y1, y2) - 30.0 AS miny, greatest(y1, y2) + 30.0 AS maxy
           FROM edges),
    ex AS (SELECT *, unnest(range(CAST(floor(minx / 64.0) AS BIGINT),
                                  CAST(floor(maxx / 64.0) AS BIGINT) + 1))
                     AS ix FROM eb),
    ec AS (SELECT *, unnest(range(CAST(floor(miny / 64.0) AS BIGINT),
                                  CAST(floor(maxy / 64.0) AS BIGINT) + 1))
                     AS iy FROM ex),
    b AS (SELECT edge_id AS b_id,
                 (11 * 72057594037927936) + ix * 268435456 + iy AS kk
          FROM ec),
    ca AS (SELECT kk, count(*) AS ca FROM a GROUP BY kk),
    cb AS (SELECT kk, count(*) AS cb FROM b GROUP BY kk),
    keys AS (
      SELECT ca.kk, ca.ca, cb.cb, ca.ca * cb.cb AS p,
             CAST(('0x' || substr(md5(CAST(ca.kk AS VARCHAR)), 1, 15))
                  AS BIGINT) % 64 AS kb
      FROM ca JOIN cb USING (kk)
    ),
    offs AS (
      SELECT *, coalesce(sum(p) OVER (ORDER BY kb, kk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM keys
    ),
    tot AS (SELECT sum(p) AS pt FROM keys),
    idx AS (
      SELECT (j * (pt // 400) + (j * (pt % 400)) // 400)
             + CAST(('0x' || substr(md5('ds0#' || CAST(j AS VARCHAR)), 1, 15))
                    AS BIGINT)
               % (((j + 1) * (pt // 400) + ((j + 1) * (pt % 400)) // 400)
                  - (j * (pt // 400) + (j * (pt % 400)) // 400)) AS pos
      FROM generate_series(0, 399) AS t(j), tot
    ),
    hit AS (
      SELECT idx.pos, o.kk,
             (idx.pos - o.off) // o.cb AS ia,
             (idx.pos - o.off) % o.cb AS ib
      FROM idx JOIN offs o ON idx.pos >= o.off AND idx.pos < o.off + o.p
    ),
    ra AS (SELECT kk, a_id, x, y,
                  row_number() OVER (PARTITION BY kk ORDER BY a_id) - 1 AS ia
           FROM a),
    rb AS (SELECT kk, b_id,
                  row_number() OVER (PARTITION BY kk ORDER BY b_id) - 1 AS ib
           FROM b),
    cand AS (
      SELECT hit.pos, ra.a_id, ra.x, ra.y, rb.b_id
      FROM hit
      JOIN ra ON hit.kk = ra.kk AND hit.ia = ra.ia
      JOIN rb ON hit.kk = rb.kk AND hit.ib = rb.ib
    ),
    acc AS (
      SELECT cand.pos, cand.a_id, cand.b_id
      FROM cand JOIN edges e ON cand.b_id = e.edge_id
      WHERE (
        CASE WHEN (e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1) > 0 THEN
          (cand.x - (e.x1 + least(greatest(((cand.x-e.x1)*(e.x2-e.x1) + (cand.y-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.x2-e.x1)))
          * (cand.x - (e.x1 + least(greatest(((cand.x-e.x1)*(e.x2-e.x1) + (cand.y-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.x2-e.x1)))
          + (cand.y - (e.y1 + least(greatest(((cand.x-e.x1)*(e.x2-e.x1) + (cand.y-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.y2-e.y1)))
          * (cand.y - (e.y1 + least(greatest(((cand.x-e.x1)*(e.x2-e.x1) + (cand.y-e.y1)*(e.y2-e.y1))
              / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.y2-e.y1)))
        ELSE (cand.x - e.x1)*(cand.x - e.x1) + (cand.y - e.y1)*(cand.y - e.y1) END
      ) <= 900.0
    )
    SELECT CAST(pos AS BIGINT) AS idx, a_id AS doc_id, b_id AS edge_id FROM (
      SELECT *, row_number() OVER (ORDER BY
        CAST(('0x' || substr(md5('ds0!' || CAST(pos AS VARCHAR)), 1, 15))
             AS BIGINT), pos) AS r
      FROM acc) z
    WHERE r <= 50
    """.replace("{PTS}", synth.sql_points())
       .replace("{EDGES}", synth.sql_edges()),
)
def q_dwithin_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform sampling over the DWithin RANGE join without
    materializing it (operators/join_sample.dwithin_uniform_sample —
    the ICDE'25 spatial range-join sampling title case): 400 dilated-
    cover candidates through the pair-grid bijection, exact
    point-segment distance² rejection, 50 accepted pairs in
    salted-hash order; every stage replayed by the oracle."""
    from hope_graph_builder_spark.operators.join_sample import (
        dwithin_uniform_sample,
    )

    pts = synth.page_points(spark, sf_dir).select("doc_id", "x", "y")
    edges = synth.page_edges(spark, sf_dir).select(
        "edge_id", "x1", "y1", "x2", "y2"
    )
    return dwithin_uniform_sample(
        pts, edges, 30.0, 50, res=11, oversample=8, salt="ds0"
    )


@register(
    "dwithin_pages_edges",
    f"""
    WITH pts AS ({synth.sql_points()}),
         edges AS ({synth.sql_edges()})
    SELECT e.edge_id, p.doc_id
    FROM edges e JOIN pts p ON (
      CASE WHEN (e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1) > 0 THEN
        (p.x - (e.x1 + least(greatest(((p.x-e.x1)*(e.x2-e.x1) + (p.y-e.y1)*(e.y2-e.y1))
            / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.x2-e.x1)))
        * (p.x - (e.x1 + least(greatest(((p.x-e.x1)*(e.x2-e.x1) + (p.y-e.y1)*(e.y2-e.y1))
            / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.x2-e.x1)))
        + (p.y - (e.y1 + least(greatest(((p.x-e.x1)*(e.x2-e.x1) + (p.y-e.y1)*(e.y2-e.y1))
            / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.y2-e.y1)))
        * (p.y - (e.y1 + least(greatest(((p.x-e.x1)*(e.x2-e.x1) + (p.y-e.y1)*(e.y2-e.y1))
            / ((e.x2-e.x1)*(e.x2-e.x1) + (e.y2-e.y1)*(e.y2-e.y1)), 0.0), 1.0) * (e.y2-e.y1)))
      ELSE (p.x - e.x1)*(p.x - e.x1) + (p.y - e.y1)*(p.y - e.y1) END
    ) <= 900.0
    """,
)
def q_dwithin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: pages within 30 m of street edges (DWithin, no buffer geometry)."""
    pts = synth.page_points(spark, sf_dir).select("doc_id", "x", "y")
    edges = synth.page_edges(spark, sf_dir).select("edge_id", "x1", "y1", "x2", "y2")
    return dwithin_join(pts, edges, dist=30.0, res=9).select("edge_id", "doc_id")


@register(
    "dwithin_polylines",
    f"""
    WITH pts AS ({synth.sql_points()}),
    pl AS ({synth.sql_polylines()}),
    seg AS (
      SELECT edge_id,
             unnest(list_slice(xs, 1, len(xs) - 1)) AS x1,
             unnest(list_slice(xs, 2, len(xs)))     AS x2,
             unnest(list_slice(ys, 1, len(ys) - 1)) AS y1,
             unnest(list_slice(ys, 2, len(ys)))     AS y2
      FROM pl
    ),
    t AS (
      SELECT s.edge_id, p.doc_id, s.x1, s.y1,
             s.x2 - s.x1 AS dx, s.y2 - s.y1 AS dy, p.x AS px, p.y AS py,
             CASE WHEN (s.x2 - s.x1)*(s.x2 - s.x1) + (s.y2 - s.y1)*(s.y2 - s.y1) > 0
                  THEN least(greatest(
                         ((p.x - s.x1)*(s.x2 - s.x1) + (p.y - s.y1)*(s.y2 - s.y1))
                         / ((s.x2 - s.x1)*(s.x2 - s.x1) + (s.y2 - s.y1)*(s.y2 - s.y1)),
                       0.0), 1.0)
                  ELSE 0.0 END AS tt
      FROM seg s, pts p
    ),
    d2 AS (
      SELECT edge_id, doc_id,
             (px - (x1 + tt*dx))*(px - (x1 + tt*dx))
             + (py - (y1 + tt*dy))*(py - (y1 + tt*dy)) AS d2
      FROM t
    )
    SELECT edge_id, doc_id, min(d2) AS min_d2
    FROM d2 GROUP BY edge_id, doc_id
    HAVING min(d2) <= 900.0
    """,
)
def q_dwithin_polylines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 over REAL multi-vertex polylines (the reference's street
    edges, utils.py:23-30): segments explode narrowly, cell-join +
    exact distance² refine prune before one (line, point) min
    aggregation — reported min_d2 is the true polyline distance², so
    even the float minimum must match the oracle's min over ALL
    segments bit-for-bit (filter-then-min ≡ min-then-filter under the
    HAVING threshold)."""
    pts = synth.page_points(spark, sf_dir).select("doc_id", "x", "y")
    pl = synth.page_polylines(spark, sf_dir)
    return dwithin_polyline_join(pts, pl, dist=30.0, res=9)


def _sql_pyramid(res_fine: int = 10, res_coarse: int = 7) -> str:
    """DuckDB twin of tile_pyramid: every level aggregated DIRECTLY from
    the raw points (the pyramid must equal the direct rollup at every
    level — decimal-sum associativity is the invariant under test)."""
    parts = []
    for r in range(res_coarse, res_fine + 1):
        size = 131072.0 / (1 << r)
        parts.append(
            f"SELECT CAST({r} AS INT) AS res,\n"
            f"       CAST({r * (1 << 56)} AS BIGINT)\n"
            f"       + CAST(floor(x / {size!r}) AS BIGINT) * {1 << 28}\n"
            f"       + CAST(floor(y / {size!r}) AS BIGINT) AS cell,\n"
            f"       CAST(count(*) AS BIGINT) AS n,\n"
            f"       CAST(sum(CAST(v AS DECIMAL(20,10))) AS DOUBLE) AS sum_v\n"
            f"FROM pts GROUP BY 2"
        )
    return (
        "WITH pts AS (SELECT doc_id, x, y,"
        " CAST(doc_id % 1000 AS DOUBLE) / CAST(8 AS DOUBLE) AS v FROM ("
        + synth.sql_points() + "))\n"
        + "\nUNION ALL\n".join(parts)
    )


@register("tile_pyramid", _sql_pyramid())
def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style tile rollup (task brief): per-cell (count, sum)
    at EVERY resolution 7..10 in one job. The engine aggregates raw
    points once at res 10 and folds each coarser level from the
    previous one (operators/rollup.tile_pyramid — geometric-series
    extra cost, ReusedExchange-planned single raw scan); the oracle
    aggregates every level DIRECTLY from raw, so the pyramid's
    level-by-level equality to the direct rollup — cells, counts, and
    decimal-exact sums — is what the hash pins."""
    from hope_graph_builder_spark.operators.rollup import tile_pyramid

    pts = synth.page_points(spark, sf_dir).select(
        "doc_id", "x", "y",
        ((F.col("doc_id") % 1000).cast("double") / F.lit(8.0)).alias("value"),
    )
    return tile_pyramid(pts, res_fine=10, res_coarse=7)


@register(
    "edge_sampling",
    f"""
    WITH edges AS ({synth.sql_edges()}),
         en AS (SELECT *, greatest(1, CAST(round_even(length / 3.0, 0) AS BIGINT)) AS n FROM edges)
    SELECT edge_id, n AS n_samples, n * (length / n) AS total_len
    FROM en
    """,
)
def q_edge_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5 conservation: sample count and Σ sample_len per edge
    (Σ over n identical quotients = n × quotient, order-independent)."""
    edges = synth.page_edges(spark, sf_dir)
    s = sample_edges(edges)
    # n × quotient (not a float fold): order-independent, bit-identical
    # to the oracle's n * (length / n)
    return s.groupBy("edge_id").agg(
        F.count("*").alias("n_samples"),
        (F.count("*") * F.min("sample_len")).alias("total_len"),
    )


# Register the relational + text/dedup/similarity batteries (they import
# `register` from this module, so import them last).
from hope_graph_builder_spark import contract_relational  # noqa: E402,F401
from hope_graph_builder_spark import contract_text  # noqa: E402,F401
from hope_graph_builder_spark import contract_pipelines  # noqa: E402,F401
