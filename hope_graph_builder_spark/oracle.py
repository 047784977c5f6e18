"""DuckDB-dialect oracle SQL mirroring the engine's semantics.

Every SQL-expressible operator from SURVEY.md §2 gets an oracle here;
the driver runs these against the same parquet tables and compares
row-count + schema + value-hash with the Spark result. The flagship
spatial pipeline is mirrored end-to-end in plain SQL (rectangle
containment replaces the cell-index machinery — same RESULTS, the
cells are only a physical access path).

Engine-parity notes (validated empirically, see tests/test_oracle_parity):
- Spark bround == DuckDB round_even at 0/1/5 dp on this data
- greatest() ignores NULLs in both
- cos/sin agree to <2 ulp; ring outputs are discretized dB ints so
  ulp-level coordinate differences cannot flip results
"""

from __future__ import annotations

from hope_graph_builder_spark import synth
from hope_graph_builder_spark.operators.noise import LAYER_NAMES, PROVIDERS, SOURCES

RING_COUNT = 20
RING_RADIUS = 7.0
TWO_PI = "6.283185307179586"
Q_IDX = int(0.7 * (RING_COUNT - 1) + 0.5) + 1  # 1-based nearest-rank index


def _agg_noise_select(prefer_syke: bool, src_table: str) -> str:
    """SQL mirror of operators/noise.aggregate_noise_values."""
    providers = PROVIDERS[::-1] if prefer_syke else PROVIDERS
    src_cols = {
        s: f"coalesce({', '.join(f'CAST({p}_{s} AS DOUBLE)' for p in providers)})"
        for s in SOURCES
    }
    pairs = ", ".join(f"{{'name': '{s}', 'val': {s}}}" for s in SOURCES)
    return f"""
      SELECT xy_id, road, train, tram, metro, n_max,
             CASE WHEN n_max IS NULL THEN []::VARCHAR[]
                  ELSE list_transform(list_filter([{pairs}], p -> p.val = n_max), p -> p.name)
             END AS n_max_sources
      FROM (
        SELECT xy_id,
               {src_cols['road']} AS road,
               {src_cols['train']} AS train,
               {src_cols['tram']} AS tram,
               {src_cols['metro']} AS metro,
               greatest({src_cols['road']}, {src_cols['train']}, {src_cols['tram']}, {src_cols['metro']}) AS n_max
        FROM {src_table}
      )
    """


def flagship_ctes() -> str:
    """WITH-clause body computing final_samples = one row per edge
    sample with n_max_adj + n_max_sources — the SQL twin of
    pipelines/noise_join.noise_final_samples."""
    nx0, ny0, nx1, ny1 = synth.NODATA_RECT
    pv_cols = ",\n        ".join(
        f"max(CASE WHEN layer = '{c}' THEN db END) AS {c}" for c in LAYER_NAMES
    )
    all_null = " AND ".join(f"{c} IS NULL" for c in LAYER_NAMES)
    interp_cols = ",\n        ".join(
        f"list_sort(list(CAST(coalesce({c}, 0) AS DOUBLE)))[{Q_IDX}] AS {c}"
        for c in LAYER_NAMES
    )
    interp_null = ",\n        ".join(
        f"CASE WHEN {c} != 0.0 THEN {c} END AS {c}" for c in LAYER_NAMES
    )
    layer_cols = ", ".join(LAYER_NAMES)
    return f"""
    edges AS ({synth.sql_edges()}),
    layers AS ({synth.sql_layers_duckdb()}),
    en AS (SELECT *, greatest(1, CAST(round_even(length / CAST(3 AS DOUBLE), 0) AS BIGINT)) AS n FROM edges),
    samples_i AS (SELECT edge_id, length, n, x1, y1, x2, y2, unnest(range(0, n)) AS i FROM en),
    samples AS (
      -- (i + 0.5) must be DOUBLE: a bare 0.5 literal is DECIMAL and
      -- drags the division into decimal arithmetic (≠ Spark's doubles)
      SELECT edge_id, length / n AS sample_len,
             x1 + (x2 - x1) * ((i + CAST(0.5 AS DOUBLE)) / n) AS x,
             y1 + (y2 - y1) * ((i + CAST(0.5 AS DOUBLE)) / n) AS y
      FROM samples_i
    ),
    samp_xy AS (
      SELECT edge_id, sample_len,
             CAST(round_even(x * CAST(10 AS DOUBLE), 0) AS BIGINT) * 10000000
             + CAST(round_even(y * CAST(10 AS DOUBLE), 0) AS BIGINT) AS xy_id
      FROM samples
    ),
    uniq_pts AS (
      SELECT xy_id,
             floor(xy_id / 10000000) / 10.0 AS x,
             (xy_id % 10000000) / 10.0 AS y
      FROM (SELECT DISTINCT xy_id FROM samp_xy)
    ),
    uniq_flag AS (
      SELECT *, (x >= {nx0} AND x < {nx1} AND y >= {ny0} AND y < {ny1}) AS nodata_zone
      FROM uniq_pts
    ),
    pv AS (
      SELECT u.xy_id,
        {pv_cols}
      FROM uniq_flag u JOIN layers l
        ON u.x >= l.minx AND u.x < l.maxx AND u.y >= l.miny AND u.y < l.maxy
      GROUP BY u.xy_id
    ),
    pts AS (
      SELECT u.xy_id, u.x, u.y, u.nodata_zone, {layer_cols},
             (u.nodata_zone AND {all_null}) AS missing_noises
      FROM uniq_flag u LEFT JOIN pv USING (xy_id)
    ),
    normal_agg AS (
      SELECT *, CASE WHEN len(n_max_sources) > 1 THEN n_max + len(n_max_sources)
                     WHEN len(n_max_sources) = 1 THEN n_max END AS n_max_adj
      FROM ({_agg_noise_select(False, "(SELECT * FROM pts WHERE NOT missing_noises)")})
    ),
    miss AS (SELECT xy_id, x, y FROM pts WHERE missing_noises),
    rings_i AS (SELECT xy_id, x, y, unnest(range(0, {RING_COUNT})) AS i FROM miss),
    rings AS (
      SELECT xy_id, i AS ring_i,
             x + CAST({RING_RADIUS} AS DOUBLE)
                 * cos(CAST({TWO_PI} AS DOUBLE) * (i + CAST(0.5 AS DOUBLE)) / CAST({RING_COUNT} AS DOUBLE)) AS x,
             y + CAST({RING_RADIUS} AS DOUBLE)
                 * sin(CAST({TWO_PI} AS DOUBLE) * (i + CAST(0.5 AS DOUBLE)) / CAST({RING_COUNT} AS DOUBLE)) AS y
      FROM rings_i
    ),
    ring_pv AS (
      SELECT r.xy_id, r.ring_i,
        {pv_cols}
      FROM rings r JOIN layers l
        ON r.x >= l.minx AND r.x < l.maxx AND r.y >= l.miny AND r.y < l.maxy
      GROUP BY r.xy_id, r.ring_i
    ),
    ring_full AS (
      SELECT r.xy_id, r.ring_i, {layer_cols}
      FROM rings r LEFT JOIN ring_pv USING (xy_id, ring_i)
    ),
    interp_q AS (
      SELECT xy_id,
        {interp_cols}
      FROM ring_full GROUP BY xy_id
    ),
    interp_vals AS (
      SELECT xy_id,
        {interp_null}
      FROM interp_q
    ),
    interp_join AS (
      SELECT m.xy_id, {layer_cols}
      FROM miss m LEFT JOIN interp_vals USING (xy_id)
    ),
    interp_agg AS (
      SELECT *, CASE WHEN len(n_max_sources) > 1 THEN n_max + len(n_max_sources)
                     WHEN len(n_max_sources) = 1 THEN n_max END AS n_max_adj
      FROM ({_agg_noise_select(True, "interp_join")})
    ),
    all_samples AS (
      SELECT xy_id, road, train, tram, metro, n_max, n_max_sources, n_max_adj FROM normal_agg
      UNION ALL
      SELECT xy_id, road, train, tram, metro, n_max, n_max_sources, n_max_adj FROM interp_agg
    ),
    final_samples AS (
      SELECT s.edge_id, s.sample_len, a.*
      FROM samp_xy s LEFT JOIN all_samples a USING (xy_id)
    )
    """


def sql_location_exposures() -> str:
    """(xy_id, per-layer max dB) — twin of pipelines.noise_join.
    location_exposures, the fused dedup+PIP+pivot stage the streaming
    module maintains incrementally. `pts` keeps unmatched locations
    via its LEFT JOIN, mirroring the engine's left cell-join."""
    cols = ",\n           ".join(f"CAST({c} AS BIGINT) AS {c}" for c in LAYER_NAMES)
    return f"""
    WITH {flagship_ctes()}
    SELECT xy_id, {cols} FROM pts
    """


def sql_noise_exposures() -> str:
    """(edge_id, db, exposure) — flat twin of edge_db_rows."""
    return f"""
    WITH {flagship_ctes()}
    SELECT edge_id, CAST(n_max_adj AS INT) AS db,
           round_even(count(*) * min(sample_len), 5) AS exposure
    FROM final_samples WHERE n_max_adj IS NOT NULL
    GROUP BY edge_id, n_max_adj
    """


def sql_noise_source_counts() -> str:
    """(edge_id, src, cnt) — flat twin of edge_source_rows."""
    return f"""
    WITH {flagship_ctes()}
    SELECT edge_id, src, count(*) AS cnt
    FROM (SELECT edge_id, unnest(n_max_sources) AS src FROM final_samples)
    WHERE src IS NOT NULL
    GROUP BY edge_id, src
    """


def sql_noise_main_source() -> str:
    """(edge_id, noise_source) — mode with the engine's deterministic
    tie-break (count desc, then source order road>train>tram>metro);
    '' for edges with no sources."""
    prio = "CASE src " + " ".join(
        f"WHEN '{s}' THEN {i}" for i, s in enumerate(SOURCES)
    ) + " END"
    return f"""
    WITH {flagship_ctes()},
    src_rows AS (
      SELECT edge_id, src, count(*) AS cnt
      FROM (SELECT edge_id, unnest(n_max_sources) AS src FROM final_samples)
      WHERE src IS NOT NULL
      GROUP BY edge_id, src
    ),
    ranked AS (
      SELECT edge_id, src,
             row_number() OVER (PARTITION BY edge_id ORDER BY cnt DESC, {prio} ASC) AS rn
      FROM src_rows
    )
    SELECT e.edge_id, coalesce(r.src, '') AS noise_source
    FROM (SELECT DISTINCT edge_id FROM final_samples) e
    LEFT JOIN (SELECT edge_id, src FROM ranked WHERE rn = 1) r USING (edge_id)
    """
