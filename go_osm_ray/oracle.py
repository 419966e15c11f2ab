"""DuckDB oracle SQL for every SQL-expressible query in __ray_entry__.

Each SQL string is the independent ground-truth computation the driver
runs side-by-side with the Ray pipeline (CORRECTNESS gate). Where the
engine and the oracle share non-trivial math (morton decode, tile/cell
assignment, expression filters, rounding) the SQL is GENERATED from the
same source fragments (geo/morton.sql_decode_exprs, geo/tiles.sql_*,
expr.Expression.to_sql, util.sql_round) so both sides agree by
construction.

The ten driver testdata tables are referenced by their pre-registered
view names; the synthetic graft tables (images / osm_*) are referenced
by absolute read_parquet paths for the given scale factor.
"""

from __future__ import annotations

from . import datagen
from .expr import Expression
from .geo import morton, tiles
from .pipelines.text import LANGS, STOPLISTS
from .util import sql_md5_num_lower, sql_round

# Filter/parameter constants shared with __ray_entry__ (single source).
KEEP_KEYS = ["amenity", "craft"]
DROP_KEY = "name"
SUB_BBOX = (-77.05, 38.85, -76.95, 38.95)
EXPR_FILTER = "(@craft like brewery) or (@craft like distillery)"
# function-map surface (SURVEY §2.9 / DFL FunctionMap): len + nested
# upper + prefix + the r4 dfl-stdlib remainder (min/max element-wise,
# substring contains, list membership over split), all mirrored into
# SQL by Expression.to_sql so the driver gate exercises each builtin
EXPR_UDF = ("len(@name) >= 7 or prefix(upper(@name), 'D') "
            "or max(len(@name), 5) >= 15 or min(len(@name), 3) == 1 "
            "or contains(@name, 'aint') or has(split(@name, ' '), 'St')")
RETENTION_EXPR = "@building like yes or @amenity like cafe"
PROJECT_KEYS = ["amenity", "name"]
PER_KEY_KEYS = ["amenity", "craft", "building", "name"]
CELL_RESOLUTIONS = (7, 8, 9, 10, 11)
TILE_ZOOMS = (10, 12, 14)
KNN_FEATURE_KEY = "amenity"
ANN_QUERY_MAX_ID = 8   # vec_id < 8 are queries; >= 8 are candidates
ANN_K = 3
# clip_filter: keep rows whose image-tower/text-tower cosine (first vs
# second half of the 64-dim embedding) rounds to >= threshold at 6 digits
CLIP_THRESHOLD = 0.25
# phash_pairs: hamming radius (11 phash bands are exact for d <= 10) and
# the deterministic id cap bounding the O(n^2) brute-force oracle
PHASH_MAX_HAMMING = 10
PHASH_PAIR_CAP = 4000
# caption_edit_pairs: edit-distance radius + the same id-cap rationale
CAPTION_MAX_LEV = 2
CAPTION_PAIR_CAP = 4000
# amenity_colocation cell resolution (zoom)
COLOC_RES = 9
# cell_tag_entropy cell resolution (finer than COLOC_RES: diversity
# needs enough occupied cells to be a histogram, not two rows)
ENTROPY_RES = 13
# embed_angular_hist deterministic sample cap (brute-force oracle bound)
ANGULAR_CAP = 256
# zonal_stats raster resolution: zoom-10 tiles x 256px grid = zoom-18 pixels
ZONAL_Z, ZONAL_GRID = 10, 256
# radius_join: keep pairs whose ROUNDED (3-digit) haversine meters <= this
RADIUS_JOIN_M = 5000.0
STOPWORDS = ["the", "a", "and", "of", "to"]
# mixture_sample gate: weights chosen so some sources cap at rate 1
# (target exceeds availability), some get fractional rates, the rest 0
MIXTURE_WEIGHTS = (("src0", 0.4), ("src1", 0.3), ("src2", 0.2),
                   ("src3", 0.1))
MIXTURE_BUDGET_FRAC = 0.2
SESSION_GAP_MIN = 30
TOKEN_RE = "[A-Za-z]+|[0-9]+|\\S"
TOKEN_PACK_SEQ_LEN = 512
# embed_neardup gate: deterministic planted near-dups (text.plant_neardups)
EMBED_NEARDUP_T = 0.95
EMBED_PLANT_EVERY = 50
EMBED_PLANT_OFFSET = 100_000
EMBED_PLANT_ALPHA = 0.1


def _paths(sf: float) -> dict[str, str]:
    datagen.ensure_tables(sf)  # layout (file vs part-dir) must exist
    d = datagen.scale_dir(sf)
    out = {}
    for n in ("images", "osm_nodes", "osm_ways", "osm_relations"):
        p = d / f"{n}.parquet"
        # the images table is a part-file directory (datagen FILE_ROWS)
        out[n] = (f"read_parquet('{p}/*.parquet')" if p.is_dir()
                  else f"read_parquet('{p}')")
    return out


def _has_key(col: str, key: str) -> str:
    return f"len(list_filter({col}, _t -> _t.key = '{key}')) > 0"


def _pts_cte(images: str) -> str:
    lon_e, lat_e = morton.sql_decode_exprs("phash")
    return (f"pts AS (SELECT image_id, {lon_e} AS lon, {lat_e} AS lat "
            f"FROM {images})")


def build(sf: float = 0.01) -> dict[str, str]:
    p = _paths(sf)
    nodes, ways, rels, images = (p["osm_nodes"], p["osm_ways"],
                                 p["osm_relations"], p["images"])
    q: dict[str, str] = {}

    # ---- reference-parity: XML source round-trip -------------------------
    # the XML fixtures are serialized FROM these parquet tables, so the
    # parquet is the independent ground truth for the XML parser
    q["osm_xml_nodes"] = f"SELECT id, lon, lat, version, uid FROM {nodes}"
    q["osm_xml_ways"] = (f"SELECT id, len(refs) AS nrefs, changeset "
                         f"FROM {ways}")
    q["osm_xml_relations"] = (
        f"SELECT id, len(members) AS n_members, "
        f"CAST(list_sum(list_transform(members, _m -> _m.ref)) AS BIGINT) "
        f"AS ref_sum FROM {rels}")

    # ---- reference-parity: filters / projections -------------------------
    keys_in = ", ".join(f"'{k}'" for k in KEEP_KEYS)
    q["osm_keep_keys"] = f"""
        SELECT id, uid, version FROM {nodes}
        WHERE len(list_filter(tags, _t -> _t.key IN ({keys_in}))) > 0"""

    q["osm_drop_keys"] = f"""
        SELECT id FROM {nodes}
        WHERE len(list_filter(tags, _t -> _t.key = '{DROP_KEY}')) = 0"""

    x0, y0, x1, y1 = SUB_BBOX
    q["osm_bbox"] = f"""
        SELECT id, {sql_round('lon', 7)} AS lon7, {sql_round('lat', 7)} AS lat7
        FROM {nodes}
        WHERE lon >= {x0} AND lon <= {x1} AND lat >= {y0} AND lat <= {y1}"""

    e = Expression(EXPR_FILTER)
    q["osm_expr_filter"] = f"""
        SELECT id, (list_filter(tags, _t -> _t.key = 'craft')[1]).value AS craft
        FROM {nodes} WHERE {e.to_sql({'id', 'uid', 'version'})}"""

    eu = Expression(EXPR_UDF)
    q["osm_expr_udf"] = f"""
        SELECT id, (list_filter(tags, _t -> _t.key = 'name')[1]).value AS name
        FROM {nodes} WHERE {eu.to_sql({'id', 'uid', 'version'})}"""

    proj_in = ", ".join(f"'{k}'" for k in PROJECT_KEYS)
    q["osm_tag_project"] = f"""
        SELECT id, _t.key AS key, _t.value AS value FROM (
          SELECT id, unnest(list_filter(tags, _t -> _t.key IN ({proj_in}))) AS _t
          FROM {nodes})"""

    # ---- reference-parity: joins / conversions ---------------------------
    q["osm_ways_to_nodes"] = f"""
        WITH mx AS (SELECT greatest((SELECT max(id) FROM {nodes}),
                                    (SELECT max(id) FROM {ways})) AS m),
        mw AS (SELECT min(id) AS v FROM {ways}),
        exp AS (SELECT w.id AS way_id, unnest(w.refs) AS ref FROM {ways} w),
        cent AS (SELECT e.way_id, avg(n.lon) AS ml, avg(n.lat) AS mla,
                        count(*) AS n_refs
                 FROM exp e JOIN {nodes} n ON n.id = e.ref GROUP BY e.way_id)
        SELECT (SELECT m FROM mx) + 1 + (c.way_id - (SELECT v FROM mw)) AS new_id,
               c.way_id, {sql_round('c.ml', 7)} AS lon_c,
               {sql_round('c.mla', 7)} AS lat_c,
               CAST(c.n_refs AS BIGINT) AS n_refs,
               w.version, w.uid, w."user" AS "user"
        FROM cent c JOIN {ways} w ON w.id = c.way_id"""

    q["osm_way_geometry"] = f"""
        SELECT w.id AS way_id,
               CASE WHEN len(w.refs) >= 4 AND w.refs[1] = w.refs[len(w.refs)]
                    THEN 'polygon' ELSE 'line' END AS kind,
               CAST(len(w.refs) AS BIGINT) AS n_points,
               {sql_round('n.lon', 7)} AS x0, {sql_round('n.lat', 7)} AS y0
        FROM {ways} w JOIN {nodes} n ON n.id = w.refs[1]"""

    # planar shoelace area + ring perimeter per closed way; engine sums
    # per-way segments via cumsum differences — identical element values,
    # fp-order drift ~1e-15 vs the 5e-10 round-9 granularity
    q["osm_way_area"] = f"""
        WITH cw AS (SELECT id, refs FROM {ways}
                    WHERE len(refs) >= 4 AND refs[1] = refs[len(refs)]),
        exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                       generate_subscripts(refs, 1) AS seq,
                       len(refs) AS np FROM cw),
        pts AS (SELECT e.way_id, e.seq, e.np, n.lon AS x, n.lat AS y
                FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, np, x, y,
                       lead(x) OVER (PARTITION BY way_id ORDER BY seq) AS x2,
                       lead(y) OVER (PARTITION BY way_id ORDER BY seq) AS y2
                FROM pts),
        agg AS (SELECT way_id, max(np) AS np, count(*) AS resolved,
                       sum(CASE WHEN x2 IS NULL THEN 0.0
                                ELSE x * y2 - x2 * y END) AS a2,
                       sum(CASE WHEN x2 IS NULL THEN 0.0
                                ELSE sqrt((x2-x)*(x2-x) + (y2-y)*(y2-y)) END) AS pl
                FROM seg GROUP BY way_id)
        SELECT way_id, CAST(np AS BIGINT) AS n_points,
               {sql_round('abs(a2) / 2.0', 9)} AS area9,
               {sql_round('pl', 9)} AS perim9
        FROM agg WHERE resolved = np"""

    er = Expression(RETENTION_EXPR)
    cols = {"id", "uid", "version"}
    q["osm_semi_join_retention"] = f"""
        SELECT DISTINCT id FROM (
          SELECT unnest(refs) AS id FROM {ways} WHERE {er.to_sql(cols)}
          UNION ALL
          SELECT id FROM {nodes} WHERE {er.to_sql(cols)})"""

    # haversine way length in meters (sphere R shared with the engine);
    # the expression mirrors the engine's op order — residual sub-ulp
    # libm drift is 12 orders below the millimeter rounding
    from .pipelines.osm import EARTH_R_M
    _d2r = "(PI() / 180.0)"
    _sdp = f"SIN(((y2 * {_d2r}) - (y * {_d2r})) / 2.0)"
    _sdl = f"SIN(((x2 - x) * {_d2r}) / 2.0)"
    _hava = (f"LEAST({_sdp} * {_sdp} + COS(y * {_d2r}) * COS(y2 * {_d2r}) "
             f"* {_sdl} * {_sdl}, 1.0)")
    q["osm_way_length"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq,
                            len(refs) AS np,
                            (len(refs) >= 4
                             AND refs[1] = refs[len(refs)]) AS closed
                     FROM {ways} WHERE len(refs) >= 2),
        pts AS (SELECT e.way_id, e.seq, e.np, e.closed, n.lon AS x,
                       n.lat AS y
                FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, np, closed, x, y,
                       lead(x) OVER w AS x2, lead(y) OVER w AS y2
                FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        agg AS (SELECT way_id, max(np) AS np, bool_or(closed) AS closed,
                       count(*) AS resolved,
                       sum(CASE WHEN x2 IS NULL THEN 0.0
                                ELSE 2.0 * {EARTH_R_M!r}
                                     * ASIN(SQRT({_hava})) END) AS ln
                FROM seg GROUP BY way_id)
        SELECT way_id, CAST(np AS BIGINT) AS n_points, closed,
               {sql_round('ln', 3)} AS len_m3
        FROM agg WHERE resolved = np"""

    # per-tag-key length rollup: len_m3 from the SAME expression tree as
    # osm_way_length; the cross-way per-key sum is the ORDERED
    # (ascending way_id) aggregate so both sides run the identical
    # sequential left fold
    q["way_tag_length_stats"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq,
                            len(refs) AS np,
                            (len(refs) >= 4
                             AND refs[1] = refs[len(refs)]) AS closed
                     FROM {ways} WHERE len(refs) >= 2),
        pts AS (SELECT e.way_id, e.seq, e.np, n.lon AS x, n.lat AS y
                FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, np, x, y,
                       lead(x) OVER w AS x2, lead(y) OVER w AS y2
                FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        agg AS (SELECT way_id, max(np) AS np, count(*) AS resolved,
                       sum(CASE WHEN x2 IS NULL THEN 0.0
                                ELSE 2.0 * {EARTH_R_M!r}
                                     * ASIN(SQRT({_hava})) END) AS ln
                FROM seg GROUP BY way_id),
        wl AS (SELECT way_id, {sql_round('ln', 3)} AS len_m3
               FROM agg WHERE resolved = np),
        tk AS (SELECT id AS way_id, u.tg.key AS key
               FROM {ways}, unnest(tags) AS u(tg)),
        j AS (SELECT tk.key, tk.way_id, wl.len_m3
              FROM tk JOIN wl USING (way_id))
        SELECT key, CAST(count(*) AS BIGINT) AS n_ways,
               {sql_round('sum(len_m3 ORDER BY way_id)', 3)} AS total_len3
        FROM j GROUP BY key"""

    # relation-membership census; DISTINCT relation count per
    # (member type, role)
    q["relation_member_roles"] = f"""
        WITH m AS (SELECT id, u.mb.type AS member_type,
                          u.mb.role AS role
                   FROM {rels}, unnest(members) AS u(mb))
        SELECT member_type, role,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(count(DISTINCT id) AS BIGINT) AS n_relations
        FROM m GROUP BY 1, 2"""

    # per-user contribution census across the three element classes
    q["osm_user_activity"] = f"""
        WITH a AS (
          SELECT uid, "user", 1 AS is_n, 0 AS is_w, 0 AS is_r,
                 CAST(version AS BIGINT) AS v FROM {nodes}
          UNION ALL SELECT uid, "user", 0, 1, 0,
                 CAST(version AS BIGINT) FROM {ways}
          UNION ALL SELECT uid, "user", 0, 0, 1,
                 CAST(version AS BIGINT) FROM {rels})
        SELECT uid, min("user") AS "user",
               CAST(sum(is_n) AS BIGINT) AS n_nodes,
               CAST(sum(is_w) AS BIGINT) AS n_ways,
               CAST(sum(is_r) AS BIGINT) AS n_relations,
               CAST(max(v) AS BIGINT) AS max_version
        FROM a GROUP BY uid"""

    # per-way proper self-intersections: segment self-join mirror of
    # the clique-pair orientation kernel (identical ccw expression tree)
    q["way_self_intersect"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq
                     FROM {ways}),
        p AS (SELECT e.way_id, e.seq, n.lon AS x, n.lat AS y
              FROM exp e JOIN {nodes} n ON n.id = e.ref),
        sg AS (SELECT way_id, seq, x AS ax, y AS ay,
                      lead(x) OVER w AS bx, lead(y) OVER w AS by2
               FROM p WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        segs AS (SELECT * FROM sg WHERE bx IS NOT NULL),
        pr AS (SELECT a.way_id,
                      (a.bx - a.ax) * (b.ay - a.ay)
                        - (a.by2 - a.ay) * (b.ax - a.ax) AS d1,
                      (a.bx - a.ax) * (b.by2 - a.ay)
                        - (a.by2 - a.ay) * (b.bx - a.ax) AS d2,
                      (b.bx - b.ax) * (a.ay - b.ay)
                        - (b.by2 - b.ay) * (a.ax - b.ax) AS d3,
                      (b.bx - b.ax) * (a.by2 - b.ay)
                        - (b.by2 - b.ay) * (a.bx - b.ax) AS d4
               FROM segs a JOIN segs b
                 ON a.way_id = b.way_id AND a.seq < b.seq),
        cr AS (SELECT way_id,
                      CAST(SUM(CASE WHEN d1 * d2 < 0 AND d3 * d4 < 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS nc
               FROM pr GROUP BY way_id),
        ns AS (SELECT way_id, CAST(count(*) AS BIGINT) AS n
               FROM segs GROUP BY way_id),
        base AS (SELECT DISTINCT way_id FROM p)
        SELECT base.way_id, COALESCE(ns.n, 0) AS n_segments,
               COALESCE(cr.nc, 0) AS n_crossings,
               COALESCE(cr.nc, 0) = 0 AS simple
        FROM base LEFT JOIN ns USING (way_id)
                  LEFT JOIN cr USING (way_id)"""

    # cross-way proper crossings: bbox-pruned segment join mirror of the
    # cell-candidate + owner-cell-of-intersection kernel
    q["segment_crossings"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq
                     FROM {ways}),
        p AS (SELECT e.way_id, e.seq, n.lon AS x, n.lat AS y
              FROM exp e JOIN {nodes} n ON n.id = e.ref),
        sg AS (SELECT way_id, seq, x AS ax, y AS ay,
                      lead(x) OVER w AS bx, lead(y) OVER w AS by2
               FROM p WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        segs AS (SELECT * FROM sg WHERE bx IS NOT NULL),
        pr AS (SELECT ((a.bx - a.ax) * (b.ay - a.ay)
                       - (a.by2 - a.ay) * (b.ax - a.ax)) AS d1,
                      ((a.bx - a.ax) * (b.by2 - a.ay)
                       - (a.by2 - a.ay) * (b.bx - a.ax)) AS d2,
                      ((b.bx - b.ax) * (a.ay - b.ay)
                       - (b.by2 - b.ay) * (a.ax - b.ax)) AS d3,
                      ((b.bx - b.ax) * (a.by2 - b.ay)
                       - (b.by2 - b.ay) * (a.bx - b.ax)) AS d4
               FROM segs a JOIN segs b ON a.way_id < b.way_id),
        cr AS (SELECT count(*) AS c FROM pr
               WHERE d1 * d2 < 0 AND d3 * d4 < 0),
        ns AS (SELECT CAST(SUM(greatest(len(refs) - 1, 0)) AS BIGINT)
                   AS s FROM {ways})
        SELECT ns.s AS n_segments, CAST(cr.c AS BIGINT) AS n_crossings
        FROM ns, cr"""

    # street-grid orientation histogram: lead-window segment mirror of
    # the way-hash adjacent-pair kernel; identical bearing term order
    # (atan2(dlon * cos(mid_lat), dlat), fmod-folded to [0, 180))
    # per-way turn stats: lag of the directed bearing per way, folded
    # to (-180, 180]; 6dp absorbs group-sum order
    q["way_turn_stats"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq
                     FROM {ways}),
        p AS (SELECT e.way_id, e.seq, n.lon AS x, n.lat AS y
              FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, seq, x, y, lead(x) OVER w AS x2,
                       lead(y) OVER w AS y2
                FROM p WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        th AS (SELECT way_id, seq,
                      degrees(atan2((x2 - x)
                                    * cos(radians((y + y2) / 2.0)),
                                    y2 - y)) AS theta
               FROM seg WHERE x2 IS NOT NULL),
        tn AS (SELECT way_id,
                      abs(fmod(fmod(theta - lag(theta) OVER
                            (PARTITION BY way_id ORDER BY seq), 360.0)
                            + 540.0, 360.0) - 180.0) AS turn
               FROM th)
        SELECT way_id, CAST(count(*) AS BIGINT) AS n_turns,
               {sql_round('SUM(turn)', 6)} AS total_turn6,
               {sql_round('MAX(turn)', 6)} AS max_turn6
        FROM tn WHERE turn IS NOT NULL GROUP BY 1"""

    q["way_bearings"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq
                     FROM {ways}),
        p AS (SELECT e.way_id, e.seq, n.lon AS x, n.lat AS y
              FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, x, y, lead(x) OVER w AS x2,
                       lead(y) OVER w AS y2
                FROM p WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        th AS (SELECT degrees(atan2((x2 - x)
                                    * cos(radians((y + y2) / 2.0)),
                                    y2 - y)) AS theta
               FROM seg WHERE x2 IS NOT NULL),
        bn AS (SELECT CAST(floor(fmod(fmod(theta, 180.0) + 180.0, 180.0)
                                 / (180.0 / 16)) AS BIGINT) AS bin
               FROM th),
        c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n
              FROM bn GROUP BY bin),
        tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM c),
        allb AS (SELECT unnest(range(16)) AS bin)
        SELECT allb.bin, COALESCE(c.n, 0) AS n,
               {sql_round('CAST(COALESCE(c.n, 0) AS DOUBLE) / tot.t', 6)}
                   AS share
        FROM allb LEFT JOIN c ON c.bin = allb.bin, tot
        ORDER BY allb.bin"""

    # connected components of ways joined by shared node refs; label
    # closure via recursive reachability (components are small by
    # construction, so the closure is cheap — embed_neardup_keep pattern)
    # conflation closure over the pyoracle CANDIDATE pairs (shared-node
    # UNION grid-bucketed geometric candidates, scalar Frechet values —
    # mirrors conflate_candidate_edges exactly); min-label reach
    q["way_conflate"] = f"""
        WITH RECURSIVE e AS (
          SELECT a, b FROM read_parquet('__EXP_WAY_FRECHET__')
          WHERE frechet3 <= 250.0),
        u AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
        reach(way_id, lbl) AS (
          SELECT id, id FROM {ways}
          UNION
          SELECT u.b, r.lbl FROM reach r JOIN u ON u.a = r.way_id)
        SELECT way_id, CAST(min(lbl) AS BIGINT) AS keeper,
               min(lbl) <> way_id AS is_dup
        FROM reach GROUP BY way_id"""

    q["way_components"] = f"""
        WITH RECURSIVE exp AS (
          SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id <> b.way_id),
        reach(way_id, lbl) AS (
          SELECT id, id FROM {ways}
          UNION
          SELECT e.b, r.lbl FROM reach r JOIN ed e ON e.a = r.way_id)
        SELECT way_id, CAST(min(lbl) AS BIGINT) AS component_id
        FROM reach GROUP BY way_id"""

    # per-cell orientation entropy: way_bearings' exact bearing/fold
    # terms, bucketed by the quadtree cell of the segment midpoint; the
    # -sum(p ln p) association differs (8 terms) ~1e-16 << the 6dp grid
    q["cell_orientation_entropy"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq
                     FROM {ways}),
        p AS (SELECT e.way_id, e.seq, n.lon AS x, n.lat AS y
              FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, x, y, lead(x) OVER w AS x2,
                       lead(y) OVER w AS y2
                FROM p WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        th AS (SELECT degrees(atan2((x2 - x)
                                    * cos(radians((y + y2) / 2.0)),
                                    y2 - y)) AS theta,
                      (x + x2) / 2.0 AS mx, (y + y2) / 2.0 AS my
               FROM seg WHERE x2 IS NOT NULL),
        bn AS (SELECT {tiles.sql_cell_id('mx', 'my', 14)} AS cell,
                      LEAST(CAST(floor(fmod(fmod(theta, 180.0) + 180.0,
                                            180.0) / (180.0 / 8))
                                 AS BIGINT), 7) AS bin
               FROM th),
        c AS (SELECT cell, bin, CAST(count(*) AS DOUBLE) AS n
              FROM bn GROUP BY 1, 2),
        t AS (SELECT cell, SUM(n) AS tot FROM c GROUP BY 1)
        SELECT c.cell, CAST(t.tot AS BIGINT) AS n_seg,
               {sql_round('-SUM((c.n / t.tot) * LN(c.n / t.tot))', 6)}
                   AS entropy6
        FROM c JOIN t ON t.cell = c.cell
        GROUP BY c.cell, t.tot"""

    # discrete Hausdorff over shared-node way pairs: per-vertex-pair
    # haversine rounded 3dp BEFORE the min/max lattice (way_length term
    # order: lat convert-then-subtract, lon subtract-then-convert), so
    # the engine's matrix kernel and this max-min aggregation agree on
    # discrete values
    _hd_sdp = f"SIN(((vb.lat * {_d2r}) - (va.lat * {_d2r})) / 2.0)"
    _hd_sdl = f"SIN((vb.lon - va.lon) * {_d2r} / 2.0)"
    _hd_a = (f"LEAST({_hd_sdp} * {_hd_sdp} + COS(va.lat * {_d2r}) "
             f"* COS(vb.lat * {_d2r}) * {_hd_sdl} * {_hd_sdl}, 1.0)")
    _hd_d = sql_round(f"2.0 * {EARTH_R_M!r} * ASIN(SQRT({_hd_a}))", 3)
    q["way_hausdorff"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq
                     FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id < b.way_id),
        pts AS (SELECT e.way_id, e.seq, n.lon, n.lat
                FROM exp e JOIN {nodes} n ON n.id = e.ref),
        d AS (SELECT ed.a, ed.b, va.seq AS sa, vb.seq AS sb,
                     {_hd_d} AS d3
              FROM ed JOIN pts va ON va.way_id = ed.a
                      JOIN pts vb ON vb.way_id = ed.b),
        m1 AS (SELECT a, b, sa, MIN(d3) AS md FROM d GROUP BY 1, 2, 3),
        h1 AS (SELECT a, b, MAX(md) AS h FROM m1 GROUP BY 1, 2),
        m2 AS (SELECT a, b, sb, MIN(d3) AS md FROM d GROUP BY 1, 2, 3),
        h2 AS (SELECT a, b, MAX(md) AS h FROM m2 GROUP BY 1, 2)
        SELECT h1.a, h1.b, GREATEST(h1.h, h2.h) AS hausdorff3
        FROM h1 JOIN h2 ON h1.a = h2.a AND h1.b = h2.b"""

    # triangle census over the full pairwise shared-node edge set
    # (a < b orientation counts each edge and triangle exactly once);
    # wedges = sum C(deg,2); clustering = 3*tri/wedges, half-away 6dp
    q["way_triangles"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id < b.way_id),
        deg AS (SELECT v, count(*) AS d FROM
                  (SELECT a AS v FROM ed UNION ALL SELECT b AS v FROM ed)
                GROUP BY v),
        tri AS (SELECT count(*) AS t
                FROM ed e1 JOIN ed e2 ON e2.a = e1.b
                     JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        wdg AS (SELECT SUM((d * (d - 1)) // 2) AS w FROM deg)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM ed) AS n_edges,
               CAST(wdg.w AS BIGINT) AS n_wedges,
               CAST(tri.t AS BIGINT) AS n_triangles,
               {sql_round('3.0 * tri.t / wdg.w', 6)} AS clustering
        FROM tri, wdg"""

    # neighborhood-Jaccard link prediction: common neighbors via the
    # center self-join over the directed (a <> b) edge set, degrees
    # from the same set; threshold compares the UNROUNDED double
    # (mirrors the engine's pre-round keep mask in way_jaccard)
    q["way_jaccard"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id <> b.way_id),
        deg AS (SELECT a AS v, count(*) AS d FROM ed GROUP BY a),
        cn AS (SELECT e1.b AS x, e2.b AS y,
                      CAST(count(*) AS BIGINT) AS common
               FROM ed e1 JOIN ed e2
                 ON e1.a = e2.a AND e1.b < e2.b
               GROUP BY 1, 2)
        SELECT cn.x AS a, cn.y AS b, cn.common,
               {sql_round('CAST(cn.common AS DOUBLE) / (da.d + db.d - cn.common)', 6)} AS jac6
        FROM cn JOIN deg da ON da.v = cn.x JOIN deg db ON db.v = cn.y
        WHERE CAST(cn.common AS DOUBLE) / (da.d + db.d - cn.common)
              >= 0.2"""

    # ring/validity audit: list_unique gives the distinct-ref count;
    # has_repeat discounts the closing duplicate of a ring
    q["osm_way_closure"] = f"""
        SELECT id AS way_id, CAST(len(refs) AS BIGINT) AS n_refs,
               CAST(list_unique(refs) AS BIGINT) AS n_unique,
               (len(refs) >= 2 AND refs[1] = refs[len(refs)])
                   AS is_closed,
               (CAST(list_unique(refs) AS BIGINT) <
                CAST(len(refs) AS BIGINT)
                - CASE WHEN len(refs) >= 2 AND refs[1] = refs[len(refs)]
                       THEN 1 ELSE 0 END) AS has_repeat
        FROM {ways}"""

    # shared-SEGMENT census per way pair: consecutive ref pairs
    # normalized lo<hi, per-way DISTINCT, self-loops dropped
    q["way_shared_segments"] = f"""
        WITH seg AS (
          SELECT DISTINCT id AS way_id,
                 LEAST(refs[u.i], refs[u.i + 1]) AS lo,
                 GREATEST(refs[u.i], refs[u.i + 1]) AS hi
          FROM {ways}, unnest(range(1, len(refs))) AS u(i)
          WHERE refs[u.i] <> refs[u.i + 1])
        SELECT s1.way_id AS a, s2.way_id AS b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM seg s1 JOIN seg s2
          ON s1.lo = s2.lo AND s1.hi = s2.hi AND s1.way_id < s2.way_id
        GROUP BY 1, 2"""

    # block-partition modularity: the order-dependent per-community sum
    # is reduced to the algebraically equal all-integer form
    # Q = W/m - D2/(4 m^2) (two float divisions, same order both sides)
    q["way_modularity"] = f"""
        WITH comm AS (SELECT id AS way_id,
                             CAST((refs[1] - 1) // 16 AS BIGINT) AS c
                      FROM {ways}),
        exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b
                 ON a.ref = b.ref AND a.way_id < b.way_id),
        e2 AS (SELECT ca.c AS ca, cb.c AS cb
               FROM ed JOIN comm ca ON ca.way_id = ed.a
                       JOIN comm cb ON cb.way_id = ed.b),
        s AS (SELECT CAST(count(*) AS BIGINT) AS m,
                     CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)
                          AS BIGINT) AS w
              FROM e2),
        dg AS (SELECT c, CAST(count(*) AS BIGINT) AS dc
               FROM (SELECT ca AS c FROM e2
                     UNION ALL SELECT cb FROM e2) GROUP BY c),
        d2 AS (SELECT CAST(sum(dc * dc) AS BIGINT) AS v FROM dg)
        SELECT s.m AS n_edges, s.w AS n_within, d2.v AS d2_sum,
               {sql_round('CAST(s.w AS DOUBLE) / CAST(s.m AS DOUBLE) '
                          '- CAST(d2.v AS DOUBLE) '
                          '/ CAST(4 * s.m * s.m AS DOUBLE)', 6)} AS q6
        FROM s, d2"""

    # Adamic-Adar: degree-bucketed common-neighbor counts, then an
    # ORDERED (ascending d) sum so both sides accumulate the same
    # sequence of doubles
    q["way_adamic_adar"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id <> b.way_id),
        deg AS (SELECT a AS v, count(*) AS d FROM ed GROUP BY a),
        cn AS (SELECT e1.b AS x, e2.b AS y, e1.a AS z
               FROM ed e1 JOIN ed e2
                 ON e1.a = e2.a AND e1.b < e2.b),
        bk AS (SELECT x, y, dg.d AS d, count(*) AS cnt
               FROM cn JOIN deg dg ON dg.v = cn.z
               GROUP BY 1, 2, 3)
        SELECT x AS a, y AS b, CAST(sum(cnt) AS BIGINT) AS common,
               {sql_round('sum(cnt / ln(d) ORDER BY d)', 6)} AS aa6
        FROM bk GROUP BY 1, 2"""

    # multi-source BFS hop depth over the same shared-node edge set,
    # capped at BFS_MAX_DEPTH hops; UNION-dedup on (way_id, d) plus the
    # depth bound makes the recursion finite on cyclic graphs
    from .pipelines.osm import BFS_MAX_DEPTH, BFS_SEED_MOD
    # tag-key PMI: distinct keys per way, clique pairs, same ln
    # expression shape both sides
    q["osm_tag_cooccurrence"] = f"""
        WITH kt AS (SELECT DISTINCT id, t.key AS k
                    FROM (SELECT id, unnest(tags) AS t FROM {ways})),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {ways}),
        kc AS (SELECT k, count(*) AS c FROM kt GROUP BY k),
        p AS (SELECT a.k AS k1, b.k AS k2, count(*) AS n_pair
              FROM kt a JOIN kt b ON a.id = b.id AND a.k < b.k
              GROUP BY 1, 2)
        SELECT k1, k2, CAST(n_pair AS BIGINT) AS n_pair,
               {sql_round('ln(n_pair * n.n / (ca.c * cb.c))', 6)} AS pmi6
        FROM p JOIN kc ca ON ca.k = p.k1 JOIN kc cb ON cb.k = p.k2
        CROSS JOIN n"""

    q["way_bfs_depth"] = f"""
        WITH RECURSIVE exp AS (
          SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id <> b.way_id),
        bfs(way_id, d) AS (
          SELECT id, 0 FROM {ways} WHERE id % {BFS_SEED_MOD} = 0
          UNION
          SELECT e.b, bfs.d + 1 FROM bfs JOIN ed e ON e.a = bfs.way_id
          WHERE bfs.d < {BFS_MAX_DEPTH})
        SELECT way_id, CAST(min(d) AS BIGINT) AS depth
        FROM bfs GROUP BY way_id"""

    q["osm_ref_degree"] = f"""
        SELECT ref AS id, CAST(count(*) AS BIGINT) AS n_refs_to
        FROM (SELECT unnest(refs) AS ref FROM {ways})
        GROUP BY ref HAVING count(*) >= 2"""

    # ---- reference-parity: aggregations ----------------------------------
    kv_union = (f"SELECT unnest(tags) AS t FROM {nodes} UNION ALL "
                f"SELECT unnest(tags) AS t FROM {ways} UNION ALL "
                f"SELECT unnest(tags) AS t FROM {rels}")
    uid_union = (f"SELECT uid FROM {nodes} UNION ALL SELECT uid FROM {ways} "
                 f"UNION ALL SELECT uid FROM {rels}")
    q["osm_summarize"] = f"""
        SELECT
          (SELECT count(*) FROM {nodes}) AS n_nodes,
          (SELECT count(*) FROM {ways}) AS n_ways,
          (SELECT count(*) FROM {rels}) AS n_relations,
          (SELECT count(DISTINCT uid) FROM ({uid_union})) AS n_users,
          (SELECT count(DISTINCT t.key) FROM ({kv_union})) AS n_keys,
          (SELECT count(*) FROM (SELECT DISTINCT t.key, t.value FROM ({kv_union}))) AS n_tags,
          (SELECT {sql_round('min(lon)', 7)} FROM {nodes}) AS min_lon,
          (SELECT {sql_round('min(lat)', 7)} FROM {nodes}) AS min_lat,
          (SELECT {sql_round('max(lon)', 7)} FROM {nodes}) AS max_lon,
          (SELECT {sql_round('max(lat)', 7)} FROM {nodes}) AS max_lat"""

    pk_in = ", ".join(f"'{k}'" for k in PER_KEY_KEYS)
    pk_vals = ", ".join(f"('{k}')" for k in PER_KEY_KEYS)
    q["osm_per_key_counts"] = f"""
        WITH ks(key) AS (VALUES {pk_vals}),
        allkv AS (
          SELECT 'n' AS src, id, unnest(tags) AS t FROM {nodes} UNION ALL
          SELECT 'w' AS src, id, unnest(tags) AS t FROM {ways} UNION ALL
          SELECT 'r' AS src, id, unnest(tags) AS t FROM {rels}),
        agg AS (
          SELECT t.key AS key,
                 count(DISTINCT CASE WHEN src = 'n' THEN id END) AS nodes_n,
                 count(DISTINCT CASE WHEN src = 'w' THEN id END) AS ways_n,
                 count(DISTINCT CASE WHEN src = 'r' THEN id END) AS rels_n
          FROM allkv WHERE t.key IN ({pk_in}) GROUP BY t.key)
        SELECT ks.key, CAST(COALESCE(agg.nodes_n, 0) AS BIGINT) AS nodes_n,
               CAST(COALESCE(agg.ways_n, 0) AS BIGINT) AS ways_n,
               CAST(COALESCE(agg.rels_n, 0) AS BIGINT) AS rels_n
        FROM ks LEFT JOIN agg ON agg.key = ks.key"""

    # ---- graft: cells / tiles --------------------------------------------
    cell_cols = ", ".join(
        f"{tiles.sql_cell_id('lon', 'lat', r)} AS cell_r{r}" for r in CELL_RESOLUTIONS)
    q["images_cells"] = f"WITH {_pts_cte(images)} SELECT image_id, {cell_cols} FROM pts"

    # cross-modal geo x text: caption tokens aggregated per res-7 cell
    lon_e7, lat_e7 = morton.sql_decode_exprs("phash")
    q["cell_caption_stats"] = f"""
        WITH tok AS (
          SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                 unnest(string_split(lower(caption), ' ')) AS w
          FROM (SELECT {lon_e7} AS lon, {lat_e7} AS lat, caption
                FROM {images})),
        cnt AS (SELECT cell, w, count(*) AS n FROM tok GROUP BY cell, w),
        top AS (SELECT cell, w, n, row_number() OVER (
                    PARTITION BY cell ORDER BY n DESC, w ASC) AS rk
                FROM cnt),
        tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_tokens
                FROM cnt GROUP BY cell)
        SELECT tot.cell, tot.n_tokens, top.w AS top_token,
               CAST(top.n AS BIGINT) AS top_n
        FROM tot JOIN top USING (cell) WHERE top.rk = 1"""

    # geo x image diversity: Shannon entropy (nats) of the per-cell
    # format mix; + 0.0 normalizes -0.0 on single-format cells (engine
    # does the same)
    q["cell_entropy"] = f"""
        WITH c AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell, fmt
                   FROM (SELECT {lon_e7} AS lon, {lat_e7} AS lat, fmt
                         FROM {images})),
        cnt AS (SELECT cell, fmt, CAST(count(*) AS DOUBLE) AS n
                FROM c GROUP BY cell, fmt),
        tot AS (SELECT cell, sum(n) AS tn, count(*) AS nf
                FROM cnt GROUP BY cell),
        e AS (SELECT cnt.cell,
                     -sum((n / tn) * ln(n / tn)) AS h
              FROM cnt JOIN tot USING (cell) GROUP BY cnt.cell)
        SELECT tot.cell, CAST(tot.tn AS BIGINT) AS n,
               CAST(tot.nf AS BIGINT) AS n_fmts,
               ({sql_round('e.h', 6)}) + 0.0 AS entropy6
        FROM tot JOIN e USING (cell)"""

    tile_cols = ", ".join(
        f"{tiles.sql_tile_x('lon', z)} AS tile{z}_x, {tiles.sql_tile_y('lat', z)} AS tile{z}_y"
        for z in TILE_ZOOMS)
    q["images_tiles"] = f"WITH {_pts_cte(images)} SELECT image_id, {tile_cols} FROM pts"

    # multi-aspect training-batch packing: same integer cut ladder as
    # pipelines/images.assign_aspect_bucket (shared constants), rank by
    # the windowed row number the engine computes distributively
    from .pipelines.images import ASPECT_BUCKETS
    _cuts = " + ".join(
        f"(CASE WHEN w2 * {b1[1] * b2[1]} >= h2 * {b1[0] * b2[0]} "
        f"THEN 1 ELSE 0 END)"
        for b1, b2 in zip(ASPECT_BUCKETS, ASPECT_BUCKETS[1:]))
    _bw = " ".join(f"WHEN {i} THEN {b[0]}" for i, b in enumerate(ASPECT_BUCKETS))
    _bh = " ".join(f"WHEN {i} THEN {b[1]}" for i, b in enumerate(ASPECT_BUCKETS))
    q["aspect_bucket_pack"] = f"""
        WITH t AS (
          SELECT image_id,
                 CAST({_cuts} AS BIGINT) AS bucket
          FROM (SELECT image_id,
                       CAST(w AS BIGINT) * w AS w2,
                       CAST(h AS BIGINT) * h AS h2 FROM {images})),
        r AS (
          SELECT image_id, bucket,
                 ROW_NUMBER() OVER (PARTITION BY bucket
                                    ORDER BY image_id) - 1 AS rn
          FROM t)
        SELECT image_id, bucket,
               CAST(CASE bucket {_bw} END AS BIGINT) AS bucket_w,
               CAST(CASE bucket {_bh} END AS BIGINT) AS bucket_h,
               rn // 64 AS batch_idx, rn % 64 AS slot
        FROM r"""

    # raster<->vector (north_rule): pixel math is tile math at zoom
    # z + log2(grid) = 10 + 6; the engine derives tile/pixel from the
    # same global pixel ids by exact integer ops (pipelines/raster.py)
    _g16 = (f"g AS (SELECT {tiles.sql_tile_x('lon', 16)} AS gx, "
            f"{tiles.sql_tile_y('lat', 16)} AS gy FROM pts), "
            f"c AS (SELECT gx, gy, CAST(count(*) AS BIGINT) AS n "
            f"FROM g GROUP BY gx, gy)")
    q["tile_raster"] = f"""
        WITH {_pts_cte(images)}, {_g16}
        SELECT gx // 64 AS tile_x, gy // 64 AS tile_y,
               gx % 64 AS px, gy % 64 AS py, n FROM c"""

    # histogram equalization: cume_dist window mirror of the cdf LUT
    # (identical count/total float64 division + half-away rounding)
    q["raster_hist_eq"] = f"""
        WITH {_pts_cte(images)}, {_g16}
        SELECT gx // 64 AS tile_x, gy // 64 AS tile_y,
               gx % 64 AS px, gy % 64 AS py, n,
               CAST({sql_round('255.0 * cume_dist() OVER (ORDER BY n)', 0)}
                    AS BIGINT) AS eq
        FROM c"""

    # nearest-neighbour gridding: window-argmin dual of the stencil
    # scatter; d2 is bit-identical on both sides (same IEEE expression
    # tree, no pow/FMA), so the argmin and the 9-dp round are exact
    q["grid_nn_interp"] = f"""
        WITH {_pts_cte(images)},
        p AS (SELECT image_id, lon, lat,
                     CAST(floor(lon / 2.0) AS BIGINT) AS gx,
                     CAST(floor(lat / 2.0) AS BIGINT) AS gy FROM pts),
        occ AS (SELECT DISTINCT gx, gy FROM p),
        cand AS (SELECT o.gx, o.gy, c.image_id,
                        (c.lon - ((o.gx + 0.5) * 2.0))
                        * (c.lon - ((o.gx + 0.5) * 2.0))
                        + (c.lat - ((o.gy + 0.5) * 2.0))
                        * (c.lat - ((o.gy + 0.5) * 2.0)) AS d2
                 FROM occ o JOIN p c
                 ON c.gx BETWEEN o.gx - 1 AND o.gx + 1
                AND c.gy BETWEEN o.gy - 1 AND o.gy + 1),
        r AS (SELECT gx, gy, image_id, d2,
                     CAST(count(*) OVER (PARTITION BY gx, gy) AS BIGINT)
                       AS n_ring,
                     row_number() OVER (PARTITION BY gx, gy
                                        ORDER BY d2, image_id) AS rk
              FROM cand)
        SELECT gx, gy, n_ring, image_id AS nn_image_id,
               {sql_round('d2', 9)} AS d2_9
        FROM r WHERE rk = 1"""

    # sparse-stencil gradient: the 4-neighbor self-join dual of the
    # engine's signed-contribution exchange; all-integer, exact
    q["raster_gradient"] = f"""
        WITH {_pts_cte(images)}, {_g16}
        SELECT a.gx // 64 AS tile_x, a.gy // 64 AS tile_y,
               a.gx % 64 AS px, a.gy % 64 AS py, a.n,
               CAST(abs(COALESCE(e.n, 0) - COALESCE(w.n, 0))
                    + abs(COALESCE(so.n, 0) - COALESCE(no.n, 0))
                    AS BIGINT) AS grad
        FROM c a
        LEFT JOIN c e ON e.gx = a.gx + 1 AND e.gy = a.gy
        LEFT JOIN c w ON w.gx = a.gx - 1 AND w.gy = a.gy
        LEFT JOIN c so ON so.gx = a.gx AND so.gy = a.gy + 1
        LEFT JOIN c no ON no.gx = a.gx AND no.gy = a.gy - 1"""

    # analytical hillshade: signed central-difference dual of the
    # gradient join; zen = radians(45), az = radians(135) (ESRI
    # 315/45 defaults); identical float formula + 6dp rounding
    q["raster_hillshade"] = f"""
        WITH {_pts_cte(images)}, {_g16},
        d AS (SELECT a.gx, a.gy, a.n,
                (COALESCE(e.n, 0) - COALESCE(w.n, 0)) / 2.0 AS dzdx,
                (COALESCE(so.n, 0) - COALESCE(no.n, 0)) / 2.0 AS dzdy
              FROM c a
              LEFT JOIN c e ON e.gx = a.gx + 1 AND e.gy = a.gy
              LEFT JOIN c w ON w.gx = a.gx - 1 AND w.gy = a.gy
              LEFT JOIN c so ON so.gx = a.gx AND so.gy = a.gy + 1
              LEFT JOIN c no ON no.gx = a.gx AND no.gy = a.gy - 1),
        h AS (SELECT gx, gy, n,
                atan(sqrt(dzdx * dzdx + dzdy * dzdy)) AS slope,
                atan2(dzdy, -dzdx) AS aspect FROM d)
        SELECT gx // 64 AS tile_x, gy // 64 AS tile_y,
               gx % 64 AS px, gy % 64 AS py, n,
               {sql_round("GREATEST(255.0 * (cos(radians(45.0)) * cos(slope) + sin(radians(45.0)) * sin(slope) * cos(radians(135.0) - aspect)), 0.0)", 6)}
                   AS shade6
        FROM h"""

    # D8 flow direction: 8-way LEFT JOIN dual of the direction-slot
    # scatter; all-integer drops, first-max CASE = smallest code
    _d8 = [("e", 1, 0), ("se", 1, 1), ("s", 0, 1), ("sw", -1, 1),
           ("w", -1, 0), ("nw", -1, -1), ("n2", 0, -1), ("ne", 1, -1)]
    _d8_joins = "\n".join(
        f"        LEFT JOIN c {al} ON {al}.gx = a.gx + {dx} "
        f"AND {al}.gy = a.gy + {dy}" for al, dx, dy in _d8)
    _d8_drops = ", ".join(
        f"a.n - COALESCE({al}.n, 0) AS d{i}"
        for i, (al, dx, dy) in enumerate(_d8))
    _d8_best = "GREATEST(" + ", ".join(f"d{i}" for i in range(8)) + ")"
    _d8_case = " ".join(f"WHEN d{i} = best THEN {i}" for i in range(8))
    q["raster_flow_dir"] = f"""
        WITH {_pts_cte(images)}, {_g16},
        j AS (SELECT a.gx, a.gy, a.n, {_d8_drops}
        FROM c a
{_d8_joins}),
        b AS (SELECT gx, gy, n, d0, d1, d2, d3, d4, d5, d6, d7,
                     {_d8_best} AS best FROM j)
        SELECT gx // 64 AS tile_x, gy // 64 AS tile_y,
               gx % 64 AS px, gy % 64 AS py, n,
               CAST(CASE WHEN best <= 0 THEN -1 {_d8_case} END
                    AS BIGINT) AS flow_dir
        FROM b"""

    # 3x3 binomial smoothing: band-join dual of the engine's weighted
    # stencil scatter; w = (2-|dx|)*(2-|dy|), all-integer, exact
    q["raster_smooth"] = f"""
        WITH {_pts_cte(images)}, {_g16}
        SELECT a.gx // 64 AS tile_x, a.gy // 64 AS tile_y,
               a.gx % 64 AS px, a.gy % 64 AS py, a.n,
               CAST(sum(b.n * (2 - abs(b.gx - a.gx))
                            * (2 - abs(b.gy - a.gy))) AS BIGINT) AS smooth
        FROM c a JOIN c b
          ON b.gx BETWEEN a.gx - 1 AND a.gx + 1
         AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
        GROUP BY a.gx, a.gy, a.n"""

    # closed-way polygon edge set (shared by the PIP family + zonal_stats)
    poly_edges = f"""cw AS (SELECT id AS feature_id, refs FROM {ways}
               WHERE len(refs) >= 4 AND refs[1] = refs[len(refs)]),
        vert AS (SELECT cw.feature_id, unnest(cw.refs) AS ref,
                        generate_subscripts(cw.refs, 1) AS pos FROM cw),
        vc AS (SELECT v.feature_id, v.pos, n.lon AS x, n.lat AS y
               FROM vert v JOIN {nodes} n ON n.id = v.ref),
        edges AS (SELECT feature_id, x AS x1, y AS y1,
                         lead(x) OVER (PARTITION BY feature_id ORDER BY pos) AS x2,
                         lead(y) OVER (PARTITION BY feature_id ORDER BY pos) AS y2
                  FROM vc),
        e2 AS (SELECT * FROM edges WHERE x2 IS NOT NULL)"""

    # zonal statistics (raster x vector overlay): zoom-18 pixel counts,
    # centers back-projected with the shared explicit-sinh formula, PIP
    # ray-cast per center against the polygon edge set, per-feature
    # aggregates with post-merge rounded mean — mirrors
    # pipelines/raster.zonal_stats (z=10, grid=256)
    _zn = float(1 << (ZONAL_Z + 8))  # grid 256 = 2^8
    _zv = f"(pi() * (1.0 - 2.0 * (gy + 0.5) / {_zn!r}))"
    q["zonal_stats"] = f"""
        WITH {_pts_cte(images)},
        g AS (SELECT {tiles.sql_tile_x('lon', ZONAL_Z + 8)} AS gx,
                     {tiles.sql_tile_y('lat', ZONAL_Z + 8)} AS gy FROM pts),
        c AS (SELECT gx, gy, CAST(count(*) AS BIGINT) AS n
              FROM g GROUP BY gx, gy),
        ctr AS (SELECT gx, gy, n,
                       ((gx + 0.5) / {_zn!r} * 360.0 - 180.0) AS clon,
                       degrees(atan((exp({_zv}) - exp(-{_zv})) / 2.0)) AS clat
                FROM c),
        {poly_edges},
        hits AS (
          SELECT ctr.gx, ctr.gy, ctr.n, e.feature_id
          FROM ctr, e2 e
          WHERE ((e.y1 > ctr.clat) <> (e.y2 > ctr.clat))
            AND (ctr.clon < (e.x2 - e.x1) * (ctr.clat - e.y1)
                            / (e.y2 - e.y1) + e.x1)
          GROUP BY ctr.gx, ctr.gy, ctr.n, e.feature_id
          HAVING count(*) % 2 = 1)
        SELECT feature_id, CAST(count(*) AS BIGINT) AS n_pixels,
               CAST(sum(n) AS BIGINT) AS pts_sum,
               CAST(max(n) AS BIGINT) AS n_max,
               {sql_round('CAST(sum(n) AS DOUBLE) / count(*)', 6)} AS mean6
        FROM hits GROUP BY feature_id"""

    # zonal majority: same hits CTE, exact log2 magnitude buckets,
    # row_number argmax (count DESC, bucket ASC)
    q["zonal_majority"] = f"""
        WITH {_pts_cte(images)},
        g AS (SELECT {tiles.sql_tile_x('lon', ZONAL_Z + 8)} AS gx,
                     {tiles.sql_tile_y('lat', ZONAL_Z + 8)} AS gy FROM pts),
        c AS (SELECT gx, gy, CAST(count(*) AS BIGINT) AS n
              FROM g GROUP BY gx, gy),
        ctr AS (SELECT gx, gy, n,
                       ((gx + 0.5) / {_zn!r} * 360.0 - 180.0) AS clon,
                       degrees(atan((exp({_zv}) - exp(-{_zv})) / 2.0)) AS clat
                FROM c),
        {poly_edges},
        hits AS (
          SELECT ctr.gx, ctr.gy, ctr.n, e.feature_id
          FROM ctr, e2 e
          WHERE ((e.y1 > ctr.clat) <> (e.y2 > ctr.clat))
            AND (ctr.clon < (e.x2 - e.x1) * (ctr.clat - e.y1)
                            / (e.y2 - e.y1) + e.x1)
          GROUP BY ctr.gx, ctr.gy, ctr.n, e.feature_id
          HAVING count(*) % 2 = 1),
        b AS (SELECT feature_id, length(printf('%b', n)) - 1 AS bucket
              FROM hits),
        bc AS (SELECT feature_id, bucket, count(*) AS c
               FROM b GROUP BY 1, 2),
        r AS (SELECT feature_id, bucket, c,
                     row_number() OVER (PARTITION BY feature_id
                                        ORDER BY c DESC, bucket) AS rk,
                     count(*) OVER (PARTITION BY feature_id) AS nb
              FROM bc)
        SELECT feature_id, CAST(bucket AS BIGINT) AS maj_bucket,
               CAST(c AS BIGINT) AS maj_n, CAST(nb AS BIGINT) AS n_buckets
        FROM r WHERE rk = 1"""

    # osm_apply_diff: CDC changeset merge — the synthetic delta recipe
    # (pipelines/osm.make_node_diff) mirrored 1:1, survivor = max
    # version per id, delete ids removed
    from .pipelines.osm import (DIFF_CREATE_EVERY, DIFF_CREATE_OFFSET,
                                DIFF_DELETE_EVERY, DIFF_LON_SHIFT,
                                DIFF_MODIFY_EVERY)
    q["osm_apply_diff"] = f"""
        WITH base AS (SELECT id, CAST(version AS BIGINT) AS version,
                             lon, lat FROM {nodes}),
        allr AS (
          SELECT id, version, lon, lat FROM base
          UNION ALL
          SELECT id, version + 1, lon + {DIFF_LON_SHIFT!r}, lat
          FROM base WHERE id % {DIFF_MODIFY_EVERY} = 0
          UNION ALL
          SELECT id + {DIFF_CREATE_OFFSET}, CAST(1 AS BIGINT), lon, lat
          FROM base WHERE id % {DIFF_CREATE_EVERY} = 0),
        r AS (SELECT *, row_number() OVER (PARTITION BY id
                                           ORDER BY version DESC) AS rn
              FROM allr)
        SELECT id, version, {sql_round('lon', 7)} AS lon7,
               {sql_round('lat', 7)} AS lat7
        FROM r
        WHERE rn = 1 AND id NOT IN
              (SELECT id FROM base WHERE id % {DIFF_DELETE_EVERY} = 0)"""

    # radius_join: full cross join + the way_length haversine term-for-
    # term (lat operands converted THEN subtracted, lon subtracted THEN
    # converted — the engine kernel's exact op order); threshold on the
    # ROUNDED distance (clip_filter's boundary contract)
    _rj_sdp = f"SIN(((f.lat * {_d2r}) - (p.lat * {_d2r})) / 2.0)"
    _rj_sdl = f"SIN(((f.lon - p.lon) * {_d2r}) / 2.0)"
    _rj_a = (f"LEAST({_rj_sdp} * {_rj_sdp} + COS(p.lat * {_d2r}) "
             f"* COS(f.lat * {_d2r}) * {_rj_sdl} * {_rj_sdl}, 1.0)")
    _rj_d = sql_round(f"2.0 * {EARTH_R_M!r} * ASIN(SQRT({_rj_a}))", 3)
    q["radius_join"] = f"""
        WITH {_pts_cte(images)},
        f AS (SELECT id, lon, lat FROM {nodes}
              WHERE {_has_key('tags', KNN_FEATURE_KEY)}),
        d AS (SELECT p.image_id, f.id AS feature_id, {_rj_d} AS dist_m3
              FROM pts p, f)
        SELECT image_id, feature_id, dist_m3
        FROM d WHERE dist_m3 <= {RADIUS_JOIN_M!r}"""

    # envelope-overlap self-join: brute-force O(n^2) range join over the
    # per-way bboxes; the engine's grid cells + owner-cell dedup must
    # reproduce this exact pair set
    _ov = ("(LEAST(a.x1, b.x1) - GREATEST(a.x0, b.x0)) * "
           "(LEAST(a.y1, b.y1) - GREATEST(a.y0, b.y0))")
    q["bbox_overlap_join"] = f"""
        WITH bb AS (
          SELECT w.id AS way_id, min(n.lon) AS x0, min(n.lat) AS y0,
                 max(n.lon) AS x1, max(n.lat) AS y1
          FROM (SELECT id, unnest(refs) AS r FROM {ways}) w
          JOIN {nodes} n ON n.id = w.r
          GROUP BY w.id)
        SELECT a.way_id AS a, b.way_id AS b, {sql_round(_ov, 6)} AS ov6
        FROM bb a JOIN bb b
          ON a.way_id < b.way_id
         AND a.x0 <= b.x1 AND b.x0 <= a.x1
         AND a.y0 <= b.y1 AND b.y0 <= a.y1"""

    q["images_quadkey"] = f"""
        WITH {_pts_cte(images)},
        qt AS (SELECT image_id, {tiles.sql_tile_x('lon', 14)} AS tx,
                      {tiles.sql_tile_y('lat', 14)} AS ty FROM pts)
        SELECT image_id, {tiles.sql_quadkey('tx', 'ty', 14)} AS qk14,
               {tiles.sql_quadkey('tx >> 4', 'ty >> 4', 10)} AS qk10
        FROM qt"""

    # 3x3 stencil density over occupied r9 cells; the 9-offset equi-join
    # is the SQL dual of the engine's searchsorted ring lookups
    _xyb = 1 << tiles.XY_BITS
    q["cell_ring"] = f"""
        WITH {_pts_cte(images)},
        cc AS (SELECT {tiles.sql_cell_id('lon', 'lat', 9)} AS cell,
                      count(*) AS n FROM pts GROUP BY cell),
        xy AS (SELECT cell, n, (cell // {_xyb}) % {_xyb} AS x,
                      cell % {_xyb} AS y FROM cc),
        offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                (0,1),(1,-1),(1,0),(1,1))
        SELECT a.cell AS cell_r9, CAST(a.n AS BIGINT) AS n,
               CAST(sum(b.n) AS BIGINT) AS ring_n
        FROM xy a CROSS JOIN offs o
        JOIN xy b ON b.x = a.x + o.dx AND b.y = a.y + o.dy
        GROUP BY a.cell, a.n"""

    _v16 = "(PI() * (1.0 - 2.0 * (gy + 0.5) / 65536.0))"
    q["raster_features"] = f"""
        WITH {_pts_cte(images)}, {_g16}
        SELECT gx // 64 AS tile_x, gy // 64 AS tile_y,
               gx % 64 AS px, gy % 64 AS py, n,
               {sql_round('(gx + 0.5) / 65536.0 * 360.0 - 180.0', 6)} AS lon6,
               {sql_round(f'DEGREES(ATAN((EXP({_v16}) - EXP(-{_v16})) / 2.0))', 6)} AS lat6
        FROM c WHERE n >= 2"""

    q["tile_pyramid"] = f"""
        WITH {_pts_cte(images)}, {_g16},
        p AS (SELECT 9 AS zoom, gx // 2 AS gxl, gy // 2 AS gyl, n FROM c
              UNION ALL SELECT 8, gx // 4, gy // 4, n FROM c
              UNION ALL SELECT 7, gx // 8, gy // 8, n FROM c),
        m AS (SELECT zoom, gxl, gyl, CAST(sum(n) AS BIGINT) AS n FROM p
              GROUP BY zoom, gxl, gyl)
        SELECT zoom, gxl // 64 AS tile_x, gyl // 64 AS tile_y,
               gxl % 64 AS px, gyl % 64 AS py, n FROM m"""

    q["cell_histogram"] = f"""
        WITH {_pts_cte(images)}
        SELECT cell_r7, CAST(count(*) AS BIGINT) AS n FROM
          (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell_r7 FROM pts)
        GROUP BY cell_r7"""

    # checkpointed partitioned write: manifest must account for every
    # input row exactly once -> same ground truth as the histogram
    q["checkpointed_write"] = f"""
        WITH {_pts_cte(images)}
        SELECT cell_r4, CAST(count(*) AS BIGINT) AS n FROM
          (SELECT {tiles.sql_cell_id('lon', 'lat', 4)} AS cell_r4 FROM pts)
        GROUP BY cell_r4"""
    q["salted_cell_histogram"] = q["cell_histogram"]

    # Gini of the per-cell count distribution (same asc-sorted
    # rank-weighted sum and term order as the engine merge)
    q["cell_gini"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                     CAST(count(*) AS DOUBLE) AS x
              FROM pts GROUP BY 1),
        r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM c),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n, SUM(x) AS tot,
                     SUM(i * x) AS sx FROM r)
        SELECT CAST(n AS BIGINT) AS n_cells, CAST(tot AS BIGINT)
                   AS n_points,
               {sql_round('(2.0 * sx / (n * tot)) - (n + 1.0) / n', 6)}
                   AS gini
        FROM s"""

    # Morisita dispersion index over occupied cells: every aggregate an
    # exact integer; the single float division mirrors the engine's
    # float(q*sxx)/float(nn*(nn-1)) (int multiply BEFORE the cast on
    # both sides)
    q["cell_morisita"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                     CAST(count(*) AS BIGINT) AS x
              FROM pts GROUP BY 1),
        s AS (SELECT CAST(count(*) AS BIGINT) AS q,
                     CAST(sum(x) AS BIGINT) AS nn,
                     CAST(sum(x * (x - 1)) AS BIGINT) AS sxx FROM c)
        SELECT q AS n_cells, nn AS n_points,
               {sql_round('CAST(q * sxx AS DOUBLE) '
                          '/ CAST(nn * (nn - 1) AS DOUBLE)', 6)}
                   AS morisita6
        FROM s"""

    # deterministic A/B split + conversion lift: exact per-user max,
    # integer counts, the same three float divisions in the same order
    q["ab_conversion_lift"] = f"""
        WITH pu AS (SELECT user_id,
                           CAST(max(CASE WHEN event_type = 'purchase'
                                         THEN 1 ELSE 0 END) AS BIGINT)
                               AS conv
                    FROM events GROUP BY 1),
        v AS (SELECT CAST(user_id % 2 AS BIGINT) AS variant,
                     CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(conv) AS BIGINT) AS n_converted
              FROM pu GROUP BY 1),
        r AS (SELECT variant, n_users, n_converted,
                     CAST(n_converted AS DOUBLE)
                     / CAST(n_users AS DOUBLE) AS rate
              FROM v),
        l AS (SELECT CASE WHEN (SELECT rate FROM r WHERE variant = 0)
                               > 0.0
                          THEN (SELECT rate FROM r WHERE variant = 1)
                               / (SELECT rate FROM r WHERE variant = 0)
                          ELSE 0.0 END AS lift)
        SELECT variant, n_users, n_converted,
               {sql_round('rate', 6)} AS rate6,
               {sql_round('lift', 6)} AS lift6
        FROM r, l"""

    # cross-layer density OLS: all-integer moments; slope/intercept are
    # the only float expressions, same term order both sides (intercept
    # uses the UNROUNDED slope)
    q["cell_node_way_ols"] = f"""
        WITH nc AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                           CAST(count(*) AS BIGINT) AS x
                    FROM {nodes} GROUP BY 1),
        exp AS (SELECT unnest(refs) AS ref FROM {ways}),
        wc AS (SELECT {tiles.sql_cell_id('n.lon', 'n.lat', 7)} AS cell,
                      CAST(count(*) AS BIGINT) AS y
               FROM exp e JOIN {nodes} n ON n.id = e.ref GROUP BY 1),
        u AS (SELECT COALESCE(nc.cell, wc.cell) AS cell,
                     COALESCE(nc.x, 0) AS x, COALESCE(wc.y, 0) AS y
              FROM nc FULL OUTER JOIN wc ON nc.cell = wc.cell),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx FROM u),
        k AS (SELECT n, sx, sy, sxy, sxx,
                     CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                          ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                               / CAST(n * sxx - sx * sx AS DOUBLE)
                     END AS slope
              FROM s)
        SELECT n AS n_cells, sx, sy, sxy, sxx,
               {sql_round('slope', 6)} AS slope6,
               {sql_round('(CAST(sy AS DOUBLE) '
                          '- slope * CAST(sx AS DOUBLE)) '
                          '/ CAST(n AS DOUBLE)', 6)} AS intercept6
        FROM k"""

    # partition-skew audit: all-integer stats, one float division,
    # argmax ties to the smallest cell id
    q["partition_skew_stats"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                     CAST(count(*) AS BIGINT) AS x
              FROM pts GROUP BY 1),
        s AS (SELECT CAST(count(*) AS BIGINT) AS q,
                     CAST(sum(x) AS BIGINT) AS nn,
                     CAST(max(x) AS BIGINT) AS mx FROM c),
        t AS (SELECT cell AS top_cell FROM c
              ORDER BY x DESC, cell ASC LIMIT 1)
        SELECT s.q AS n_cells, s.nn AS n_points, s.mx AS max_n,
               t.top_cell,
               {sql_round('CAST(s.mx * s.q AS DOUBLE) '
                          '/ CAST(s.nn AS DOUBLE)', 6)} AS skew6
        FROM s, t"""

    # per-format dataset card: exact integer sums, three float means
    q["image_corpus_card"] = f"""
        SELECT fmt, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes,
               CAST(sum(CAST(w AS BIGINT) * CAST(h AS BIGINT)) AS BIGINT)
                   AS total_px,
               {sql_round('CAST(sum(CAST(w AS BIGINT)) AS DOUBLE) '
                          '/ CAST(count(*) AS DOUBLE)', 6)} AS mean_w6,
               {sql_round('CAST(sum(CAST(h AS BIGINT)) AS DOUBLE) '
                          '/ CAST(count(*) AS DOUBLE)', 6)} AS mean_h6,
               {sql_round('CAST(sum(length(caption)) AS DOUBLE) '
                          '/ CAST(count(*) AS DOUBLE)', 6)}
                   AS mean_caption_len6
        FROM {images} GROUP BY fmt"""

    # per-cell storage footprint: exact integer byte sums
    _lon_s, _lat_s = morton.sql_decode_exprs("phash")
    q["cell_storage"] = f"""
        WITH p AS (SELECT {_lon_s} AS lon, {_lat_s} AS lat,
                          CAST(octet_length(bytes) AS BIGINT) AS nb
                   FROM {images})
        SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell_r7,
               CAST(count(*) AS BIGINT) AS n_imgs,
               CAST(SUM(nb) AS BIGINT) AS bytes_total,
               {sql_round('CAST(SUM(nb) AS DOUBLE) / count(*)', 6)}
                   AS bytes_mean
        FROM p GROUP BY 1"""

    # per-cell representative image: window-argmax mirror of the
    # two-level candidate combiner (same px desc / image_id tiebreak)
    _lon_e, _lat_e = morton.sql_decode_exprs("phash")
    q["cell_representative"] = f"""
        WITH p AS (SELECT image_id, w, h, {_lon_e} AS lon, {_lat_e} AS lat
                   FROM {images}),
        c AS (SELECT image_id, CAST(w AS BIGINT) * h AS px,
                     {tiles.sql_cell_id('lon', 'lat', 7)} AS cell_r7
              FROM p),
        r AS (SELECT cell_r7, image_id, px,
                     row_number() OVER (PARTITION BY cell_r7
                                        ORDER BY px DESC, image_id) AS rk,
                     count(*) OVER (PARTITION BY cell_r7) AS n_imgs
              FROM c)
        SELECT cell_r7, image_id, px, CAST(n_imgs AS BIGINT) AS n_imgs
        FROM r WHERE rk = 1"""

    # global Moran's I: 4-way rook equality-join union mirrors the
    # engine's searchsorted neighbour pass; identical term order
    # num * N / W / den and half-away rounding at 6 dp
    q["morans_i"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT {tiles.sql_tile_x('lon', 7)} AS x,
                     {tiles.sql_tile_y('lat', 7)} AS y,
                     CAST(count(*) AS DOUBLE) AS n
              FROM pts GROUP BY 1, 2),
        s AS (SELECT count(*) AS nc, avg(n) AS m FROM c),
        pairs AS (
          SELECT a.n AS na, b.n AS nb FROM c a JOIN c b
            ON a.x = b.x + 1 AND a.y = b.y
          UNION ALL SELECT a.n, b.n FROM c a JOIN c b
            ON a.x = b.x - 1 AND a.y = b.y
          UNION ALL SELECT a.n, b.n FROM c a JOIN c b
            ON a.x = b.x AND a.y = b.y + 1
          UNION ALL SELECT a.n, b.n FROM c a JOIN c b
            ON a.x = b.x AND a.y = b.y - 1),
        num AS (SELECT SUM((na - m) * (nb - m)) AS v,
                       CAST(count(*) AS BIGINT) AS w FROM pairs, s),
        den AS (SELECT SUM((n - m) * (n - m)) AS v FROM c, s)
        SELECT CAST(s.nc AS BIGINT) AS n_cells, num.w AS w_pairs,
               {sql_round('num.v * s.nc / num.w / den.v', 6)} AS morans_i
        FROM s, num, den"""

    # quadtree compaction (H3 compact analog): per-level HAVING
    # count=4 mirror of the vectorized parent-count passes
    _enc = "CAST({r} * 288230376151711744 + {x} * 536870912 + {y} AS BIGINT)"
    q["cell_compact"] = f"""
        WITH {_pts_cte(images)},
        c9 AS (SELECT DISTINCT {tiles.sql_tile_x('lon', 9)} AS x,
                               {tiles.sql_tile_y('lat', 9)} AS y FROM pts),
        p8 AS (SELECT x // 2 AS x, y // 2 AS y FROM c9
               GROUP BY 1, 2 HAVING count(*) = 4),
        k9 AS (SELECT c9.x, c9.y FROM c9 LEFT JOIN p8
                 ON p8.x = c9.x // 2 AND p8.y = c9.y // 2
               WHERE p8.x IS NULL),
        p7 AS (SELECT x // 2 AS x, y // 2 AS y FROM p8
               GROUP BY 1, 2 HAVING count(*) = 4),
        k8 AS (SELECT p8.x, p8.y FROM p8 LEFT JOIN p7
                 ON p7.x = p8.x // 2 AND p7.y = p8.y // 2
               WHERE p7.x IS NULL)
        SELECT {_enc.format(r=9, x='x', y='y')} AS cell,
               CAST(9 AS BIGINT) AS cell_res,
               CAST(1 AS BIGINT) AS n_leaves FROM k9
        UNION ALL
        SELECT {_enc.format(r=8, x='x', y='y')},
               CAST(8 AS BIGINT), CAST(4 AS BIGINT) FROM k8
        UNION ALL
        SELECT {_enc.format(r=7, x='x', y='y')},
               CAST(7 AS BIGINT), CAST(16 AS BIGINT) FROM p7"""

    # Getis-Ord Gi* hotspots: self + 4-way rook union mirror of the
    # searchsorted neighbour pass; identical term order in the statistic
    q["hotspot_gi"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT {tiles.sql_tile_x('lon', 7)} AS x,
                     {tiles.sql_tile_y('lat', 7)} AS y,
                     CAST(count(*) AS DOUBLE) AS n
              FROM pts GROUP BY 1, 2),
        s AS (SELECT count(*) AS nc, avg(n) AS m,
                     sqrt(SUM(n * n) / count(*) - avg(n) * avg(n)) AS sd
              FROM c),
        pr AS (
          SELECT a.x, a.y, b.n AS nj FROM c a JOIN c b
            ON b.x = a.x AND b.y = a.y
          UNION ALL SELECT a.x, a.y, b.n FROM c a JOIN c b
            ON b.x = a.x + 1 AND b.y = a.y
          UNION ALL SELECT a.x, a.y, b.n FROM c a JOIN c b
            ON b.x = a.x - 1 AND b.y = a.y
          UNION ALL SELECT a.x, a.y, b.n FROM c a JOIN c b
            ON b.x = a.x AND b.y = a.y + 1
          UNION ALL SELECT a.x, a.y, b.n FROM c a JOIN c b
            ON b.x = a.x AND b.y = a.y - 1),
        agg AS (SELECT x, y, SUM(nj) AS nbr,
                       CAST(count(*) AS BIGINT) AS k
                FROM pr GROUP BY x, y)
        SELECT CAST(a.x * 4294967296 + a.y AS BIGINT) AS cell,
               CAST(c.n AS BIGINT) AS n, a.k AS k_nbrs,
               {sql_round('(a.nbr - s.m * a.k)'
                          ' / (s.sd * sqrt((s.nc * a.k - a.k * a.k)'
                          ' / (s.nc - 1)))', 6)} AS gi
        FROM agg a JOIN c ON c.x = a.x AND c.y = a.y, s"""

    q["tile_topk"] = f"""
        WITH {_pts_cte(images)},
        t AS (SELECT {tiles.sql_tile_x('lon', 12)} AS tile_x,
                     {tiles.sql_tile_y('lat', 12)} AS tile_y FROM pts)
        SELECT tile_x, tile_y, CAST(count(*) AS BIGINT) AS n FROM t
        GROUP BY tile_x, tile_y
        ORDER BY n DESC, tile_x, tile_y LIMIT 20"""

    # ---- graft: spatial joins --------------------------------------------
    pip_core = f"""
        {_pts_cte(images)},
        {poly_edges},
        hits AS (
          SELECT p.image_id, e.feature_id
          FROM pts p, e2 e
          WHERE ((e.y1 > p.lat) <> (e.y2 > p.lat))
            AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)
          GROUP BY p.image_id, e.feature_id
          HAVING count(*) % 2 = 1)"""
    q["pip_join"] = f"WITH {pip_core} SELECT image_id, feature_id FROM hits"

    # spatial anti-join: the points pip_join drops (inside NO polygon)
    q["pip_anti_join"] = f"""
        WITH {pip_core}
        SELECT p.image_id, {sql_round('p.lon', 7)} AS lon7,
               {sql_round('p.lat', 7)} AS lat7
        FROM pts p ANTI JOIN hits h ON h.image_id = p.image_id"""

    # fused flagship-with-decode: spatial columns from the SQL ray-cast,
    # pixel summary from the python-oracle expected parquet (built below
    # by ensure_expected — referenced lazily here, resolved after it runs)
    q["flagship_decode"] = f"""
        WITH {pip_core},
        agg AS (SELECT image_id, min(feature_id) AS pipf FROM hits
                GROUP BY image_id)
        SELECT p.image_id,
               {tiles.sql_cell_id('p.lon', 'p.lat', 7)} AS cell_r7,
               {tiles.sql_tile_x('p.lon', 14)} AS tile14_x,
               {tiles.sql_tile_y('p.lat', 14)} AS tile14_y,
               COALESCE(a.pipf, -1) AS pip_feature_id,
               st.mean_px6
        FROM pts p
        LEFT JOIN agg a ON a.image_id = p.image_id
        JOIN read_parquet('__EXP_IMAGE_STATS__') st
          ON st.image_id = p.image_id"""
    # cell-prefix-sharded PIP must produce the identical hit set
    # polygon containment hierarchy: vertex-mean probes (ALL ring
    # vertices, position order) + the shared ray-cast, self excluded
    q["polygon_hierarchy"] = f"""
        WITH {poly_edges},
        cent AS (SELECT feature_id AS way_id, avg(x) AS cx, avg(y) AS cy
                 FROM vc GROUP BY feature_id)
        SELECT c.way_id, e.feature_id AS parent_id
        FROM cent c, e2 e
        WHERE e.feature_id <> c.way_id
          AND ((e.y1 > c.cy) <> (e.y2 > c.cy))
          AND (c.cx < (e.x2 - e.x1) * (c.cy - e.y1) / (e.y2 - e.y1)
                      + e.x1)
        GROUP BY c.way_id, e.feature_id
        HAVING count(*) % 2 = 1"""

    q["pip_join_sharded"] = q["pip_join"]
    q["pip_feature_counts"] = f"""
        WITH {pip_core}
        SELECT feature_id, CAST(count(*) AS BIGINT) AS n_images
        FROM hits GROUP BY feature_id"""

    q["knn_nearest"] = f"""
        WITH {_pts_cte(images)},
        feats AS (SELECT id AS feature_id, lon, lat FROM {nodes}
                  WHERE {_has_key('tags', KNN_FEATURE_KEY)}),
        d AS (SELECT p.image_id, f.feature_id,
                     (p.lon - f.lon) * (p.lon - f.lon)
                     + (p.lat - f.lat) * (p.lat - f.lat) AS d2
              FROM pts p CROSS JOIN feats f),
        r AS (SELECT image_id, feature_id,
                     row_number() OVER (PARTITION BY image_id
                                        ORDER BY d2, feature_id) AS rn FROM d)
        SELECT image_id, feature_id FROM r WHERE rn = 1"""
    # cell-partitioned + ring-expansion kNN must match the full scan
    q["knn_nearest_sharded"] = q["knn_nearest"]

    # kNN majority-vote classification: same (d2, feature_id) neighbour
    # order as knn_nearest; winner by (votes desc, label asc)
    from .pipelines.spatial import KNN_CLASSIFY_K
    q["knn_classify"] = f"""
        WITH {_pts_cte(images)},
        feats AS (SELECT id AS fid, lon, lat,
                         list_filter(tags, _t -> _t.key = '{KNN_FEATURE_KEY}')[1].value AS label
                  FROM {nodes}
                  WHERE {_has_key('tags', KNN_FEATURE_KEY)}),
        d AS (SELECT p.image_id, f.fid, f.label,
                     (p.lon - f.lon) * (p.lon - f.lon)
                     + (p.lat - f.lat) * (p.lat - f.lat) AS d2
              FROM pts p CROSS JOIN feats f),
        r AS (SELECT image_id, label,
                     row_number() OVER (PARTITION BY image_id
                                        ORDER BY d2, fid) AS rn FROM d),
        v AS (SELECT image_id, label, count(*) AS votes FROM r
              WHERE rn <= {KNN_CLASSIFY_K} GROUP BY image_id, label),
        w AS (SELECT image_id, label, votes,
                     row_number() OVER (PARTITION BY image_id
                                        ORDER BY votes DESC, label ASC) AS wrk
              FROM v)
        SELECT image_id, label, CAST(votes AS BIGINT) AS n_votes
        FROM w WHERE wrk = 1"""

    # ---- vectors ----------------------------------------------------------
    q["ann_topk"] = f"""
        WITH qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
                    WHERE vec_id < {ANN_QUERY_MAX_ID}),
        cv AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id >= {ANN_QUERY_MAX_ID}),
        s AS (SELECT qv.query_id, cv.vec_id,
                     list_cosine_similarity(qv.embedding, cv.embedding) AS sim
              FROM qv CROSS JOIN cv),
        r AS (SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rank
              FROM s)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
        FROM r WHERE rank <= {ANN_K}"""

    # clip_filter: both towers ride the same row (halves of the 64-dim
    # embedding); DOUBLE[] cast forces DuckDB's float64 kernel (float
    # lists run float32 — measured 1.2e-7 drift vs the engine's float64
    # math; the cast brings parity to 2e-16, 9 orders under the rounding
    # grid). Threshold applies to the ROUNDED value on both sides.
    _clip_cos = sql_round(
        "list_cosine_similarity((embedding::DOUBLE[])[1:32], "
        "(embedding::DOUBLE[])[33:64])", 6)
    q["clip_filter"] = f"""
        SELECT vec_id, {_clip_cos} AS cos6
        FROM embeddings
        WHERE {_clip_cos} >= {CLIP_THRESHOLD}"""

    # phash_pairs: brute-force O(n^2) hamming join on the id-capped
    # subset — the independent plan the banded multi-index exchange
    # must reproduce exactly (the banding is lossless for d <= 10)
    q["phash_pairs"] = f"""
        WITH im AS (SELECT CAST(substring(image_id, 4) AS BIGINT) AS iid,
                           phash
                    FROM {images}
                    WHERE CAST(substring(image_id, 4) AS BIGINT)
                          < {PHASH_PAIR_CAP})
        SELECT a.iid AS a, b.iid AS b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM im a JOIN im b ON a.iid < b.iid
        WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}"""

    # image_dedup_keep: true connected components over the same brute-
    # force pair set via recursive closure (pairs are tiny under the id
    # cap), keep each component's smallest id — the independent plan the
    # engine's banded-LSH + union-find/BSP purge must reproduce exactly
    q["image_dedup_keep"] = f"""
        WITH RECURSIVE im AS (
          SELECT CAST(substring(image_id, 4) AS BIGINT) AS iid, phash
          FROM {images}
          WHERE CAST(substring(image_id, 4) AS BIGINT) < {PHASH_PAIR_CAP}),
        p AS (SELECT a.iid AS a, b.iid AS b
              FROM im a JOIN im b ON a.iid < b.iid
              WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}),
        e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        reach(s, d) AS (
          SELECT a, b FROM e
          UNION
          SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.d),
        dropped AS (SELECT DISTINCT s FROM reach WHERE d < s)
        SELECT iid FROM im WHERE iid NOT IN (SELECT s FROM dropped)"""

    # image curation funnel: cumulative per-fmt survival counts; the
    # aspect bound is an integer cross-multiply on both sides
    _f1 = "w * h >= 512"
    _f2 = f"{_f1} AND greatest(w, h) * 2 <= least(w, h) * 3"
    _f3 = f"{_f2} AND length(caption) >= 34"
    q["image_curation_funnel"] = f"""
        SELECT fmt, CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN {_f1} THEN 1 ELSE 0 END) AS BIGINT) AS n_px,
               CAST(sum(CASE WHEN {_f2} THEN 1 ELSE 0 END) AS BIGINT) AS n_aspect,
               CAST(sum(CASE WHEN {_f3} THEN 1 ELSE 0 END) AS BIGINT) AS n_caption
        FROM {images} GROUP BY fmt"""

    # duplicate caption-template groups (n >= 2): shared-RE2 digit
    # collapse + two-level distinct mirror
    q["caption_dupes"] = f"""
        WITH tpl AS (SELECT regexp_replace(caption, '[0-9]+', '#', 'g')
                       AS template, fmt, image_id FROM {images})
        SELECT template, CAST(count(*) AS BIGINT) AS n_images,
               CAST(count(DISTINCT fmt) AS BIGINT) AS n_fmts,
               min(image_id) AS keeper
        FROM tpl GROUP BY template HAVING count(*) >= 2"""

    # caption/pixel Pearson correlation: corr() mirror of the 6-moment
    # combiner (sample corr == population-moment formula algebraically;
    # both sides round at 6dp — the embed_covariance precedent)
    q["caption_align"] = f"""
        SELECT fmt, CAST(count(*) AS BIGINT) AS n,
               {sql_round('COALESCE(corr(length(caption),'
                          ' CAST(w AS DOUBLE) * h), 0.0)', 6)} AS corr
        FROM {images} GROUP BY fmt"""

    # per-cell bounding box: min/max of the bit-exact decoded lon/lat,
    # rounded AFTER aggregation by the shared sql_round mirror
    q["cell_bbox"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell_r7,
                     lon, lat FROM pts)
        SELECT cell_r7,
               {sql_round('min(lon)', 6)} AS lon_min6,
               {sql_round('max(lon)', 6)} AS lon_max6,
               {sql_round('min(lat)', 6)} AS lat_min6,
               {sql_round('max(lat)', 6)} AS lat_max6,
               CAST(count(*) AS BIGINT) AS n
        FROM c GROUP BY cell_r7"""

    # int8 scalar-quantized ANN: per-dim min/max calibration, half-away
    # quantization (shared rounding formula), INTEGER dot products — the
    # scores compare exactly, no float tolerance needed
    _sq_q = sql_round(
        "CASE WHEN mx > mn THEN (x - mn) * 255.0 / (mx - mn) "
        "ELSE 0.0 END", 0)
    q["ann_sq_topk"] = f"""
        WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings),
        mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM e GROUP BY i),
        qv AS (SELECT vec_id, i, CAST({_sq_q} AS BIGINT) AS q
               FROM e JOIN mm USING (i)),
        dots AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                        sum(a.q * b.q) AS dot
                 FROM qv a JOIN qv b USING (i)
                 WHERE a.vec_id < {ANN_QUERY_MAX_ID}
                   AND b.vec_id >= {ANN_QUERY_MAX_ID}
                 GROUP BY a.vec_id, b.vec_id),
        r AS (SELECT query_id, vec_id, dot,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dot DESC, vec_id) AS rank
              FROM dots)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
               CAST(dot AS BIGINT) AS dot
        FROM r WHERE rank <= {ANN_K}"""

    # embed near-dup over the augmented table (the pipeline's
    # plant_neardups is mirrored 1:1: v' = v + alpha * reverse(v))
    q["embed_neardup"] = f"""
        WITH aug AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + {EMBED_PLANT_OFFSET} AS vec_id,
                 list_transform(list_zip(embedding, list_reverse(embedding)),
                                x -> x[1] + {EMBED_PLANT_ALPHA} * x[2]) AS embedding
          FROM embeddings WHERE vec_id % {EMBED_PLANT_EVERY} = 0)
        SELECT x.vec_id AS a, y.vec_id AS b
        FROM aug x JOIN aug y ON x.vec_id < y.vec_id
        WHERE list_cosine_similarity(x.embedding, y.embedding)
              >= {EMBED_NEARDUP_T}"""

    # near-dup PURGE over the augmented vectors: keep each connected
    # component's smallest id (true CC via recursive closure — pairs are
    # tiny by construction, so the closure is cheap)
    q["embed_neardup_keep"] = f"""
        WITH RECURSIVE aug AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + {EMBED_PLANT_OFFSET} AS vec_id,
                 list_transform(list_zip(embedding, list_reverse(embedding)),
                                x -> x[1] + {EMBED_PLANT_ALPHA} * x[2]) AS embedding
          FROM embeddings WHERE vec_id % {EMBED_PLANT_EVERY} = 0),
        p AS (SELECT x.vec_id AS a, y.vec_id AS b
              FROM aug x JOIN aug y ON x.vec_id < y.vec_id
              WHERE list_cosine_similarity(x.embedding, y.embedding)
                    >= {EMBED_NEARDUP_T}),
        e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        reach(s, d) AS (
          SELECT a, b FROM e
          UNION
          SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.d),
        dropped AS (SELECT DISTINCT s FROM reach WHERE d < s)
        SELECT vec_id FROM aug
        WHERE vec_id NOT IN (SELECT s FROM dropped)"""

    # ---- documents ---------------------------------------------------------
    norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    q["exact_dedup_docs"] = f"""
        SELECT md5({norm}) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper_id,
               CAST(count(*) AS BIGINT) AS group_n
        FROM documents GROUP BY 1"""

    q["doc_fingerprint"] = f"SELECT doc_id, md5({norm}) AS fp FROM documents"

    score_cols = []
    for lang in LANGS:
        lst = ", ".join(f"'{w}'" for w in STOPLISTS[lang])
        score_cols.append(
            f"len(list_intersect(list_distinct(string_split(lower(text), ' ')), [{lst}])) AS s_{lang}")
    max_expr = "greatest(" + ", ".join(f"s_{lang}" for lang in LANGS) + ")"
    pred_cases = " ".join(f"WHEN s_{lang} = m THEN '{lang}'" for lang in LANGS)
    q["langid"] = f"""
        WITH s AS (SELECT doc_id, {', '.join(score_cols)} FROM documents),
        m AS (SELECT s.*, {max_expr} AS m FROM s)
        SELECT doc_id, CASE WHEN m = 0 THEN 'und' {pred_cases} END AS pred_lang
        FROM m"""

    # langid confusion matrix vs the labelled lang column
    q["langid_confusion"] = f"""
        WITH s AS (SELECT doc_id, lang, {', '.join(score_cols)}
                   FROM documents),
        m AS (SELECT s.*, {max_expr} AS m FROM s),
        l AS (SELECT lang,
                     CASE WHEN m = 0 THEN 'und' {pred_cases} END
                         AS pred_lang
              FROM m)
        SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
        FROM l GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""

    q["lang_token_stats"] = f"""
        WITH s AS (SELECT doc_id, {', '.join(score_cols)} FROM documents),
        m AS (SELECT s.*, {max_expr} AS m FROM s),
        l AS (SELECT doc_id,
                     CASE WHEN m = 0 THEN 'und' {pred_cases} END AS pred_lang
              FROM m),
        t AS (SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '{TOKEN_RE}'))
                          AS BIGINT) AS n FROM documents)
        SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_tokens
        FROM l JOIN t USING (doc_id) GROUP BY pred_lang"""

    stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)
    q["doc_quality"] = f"""
        WITH b AS (SELECT doc_id, text,
                          len(string_split(text, ' ')) AS nw,
                          length(text) AS nc FROM documents)
        SELECT doc_id, CAST(nw AS BIGINT) AS n_words, CAST(nc AS BIGINT) AS n_chars,
               {sql_round('(nc - (nw - 1)) / CAST(nw AS DOUBLE)', 6)} AS avg_word_len,
               {sql_round(f"len(list_filter(string_split(lower(text), ' '), _w -> _w IN ({stop_in}))) / CAST(nw AS DOUBLE)", 6)} AS stop_ratio
        FROM b"""

    # Flesch reading ease: all three counts are global RE2 match counts
    # (DuckDB's regex engine is also RE2, so regexp_extract_all mirrors
    # pc.count_substring_regex's non-overlapping leftmost semantics);
    # sentences clamped to >= 1, zero-word docs dropped, and the float
    # expression is parenthesized identically to the engine's
    q["readability"] = f"""
        WITH c AS (SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                    AS DOUBLE) AS w,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS DOUBLE) AS s,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS DOUBLE) AS y
               FROM documents)
        SELECT doc_id, CAST(w AS BIGINT) AS words,
               CAST(s AS BIGINT) AS sents, CAST(y AS BIGINT) AS syll,
               {sql_round('(206.835 - 1.015 * (w / s)) - 84.6 * (y / w)', 6)} AS flesch6
        FROM c WHERE w > 0"""

    q["quality_funnel"] = f"""
        WITH b AS (SELECT source,
                          len(string_split(text, ' ')) AS nw,
                          length(text) AS nc,
                          {sql_round('(length(text) - (len(string_split(text, chr(32))) - 1)) / CAST(len(string_split(text, chr(32))) AS DOUBLE)', 6)} AS wl,
                          {sql_round(f"len(list_filter(string_split(lower(text), ' '), _w -> _w IN ({stop_in}))) / CAST(len(string_split(text, chr(32))) AS DOUBLE)", 6)} AS sr
                   FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (WHERE nc >= 150) AS BIGINT) AS n_len,
               CAST(COUNT(*) FILTER (WHERE nc >= 150 AND nw >= 30) AS BIGINT) AS n_tok,
               CAST(COUNT(*) FILTER (WHERE nc >= 150 AND nw >= 30 AND sr >= 0.03) AS BIGINT) AS n_stopw,
               CAST(COUNT(*) FILTER (WHERE nc >= 150 AND nw >= 30 AND sr >= 0.03 AND wl >= 4.35 AND wl <= 4.72) AS BIGINT) AS n_clean
        FROM b GROUP BY source"""

    q["span_dedup"] = """
        WITH mx AS (SELECT CAST(max(length(text)) AS BIGINT) AS m FROM documents),
             w AS (SELECT doc_id, g.i AS pos,
                          substr(text, CAST(g.i + 1 AS BIGINT), 64) AS win
                   FROM documents d
                   JOIN (SELECT unnest(range(0, (SELECT m FROM mx), 32)) AS i) g
                     ON g.i + 64 <= CAST(length(d.text) AS BIGINT)),
             dd AS (SELECT win FROM w GROUP BY win
                    HAVING COUNT(DISTINCT doc_id) > 1)
        SELECT w.doc_id, CAST(w.pos AS BIGINT) AS pos
        FROM w JOIN dd USING (win)"""

    q["line_dedup"] = """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
             c AS (SELECT doc_id, g.i,
                          array_to_string(
                            ws[(g.i - 1) * 10 + 1 : g.i * 10], ' ') AS chunk
                   FROM w
                   JOIN (SELECT unnest(range(1, 1 + (SELECT CAST(
                           ceil(max(len(ws)) / 10.0) AS BIGINT) FROM w))) AS i) g
                     ON (g.i - 1) * 10 < len(w.ws)),
             dd AS (SELECT chunk FROM c GROUP BY chunk
                    HAVING COUNT(DISTINCT doc_id) > 1)
        SELECT c.doc_id,
               COUNT(*) AS n_chunks,
               CAST(COUNT(*) FILTER (WHERE dd.chunk IS NULL) AS BIGINT)
                 AS n_kept,
               COALESCE(string_agg(c.chunk, ' ' ORDER BY c.i)
                          FILTER (WHERE dd.chunk IS NULL), '') AS text_clean
        FROM c LEFT JOIN dd ON c.chunk = dd.chunk
        GROUP BY c.doc_id"""

    q["text_normalize"] = """
        SELECT doc_id,
               trim(regexp_replace(lower(nfc_normalize(text)),
                                   '\\s+', ' ', 'g')) AS norm_text
        FROM documents"""

    q["token_count"] = f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
        FROM documents"""

    # EXACT n-gram Jaccard pairs (no common-shingle cutoff, so every
    # qualifying pair and its exact jaccard appear — the full-gate form
    # of the blocked ngram_jaccard_pairs; hashed-shingle set sizes equal
    # string-shingle set sizes barring 2^-64 collisions)
    q["ngram_jaccard_exact"] = f"""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                      AS shs
               FROM toks),
        e AS (SELECT x.doc_id AS a, y.doc_id AS b,
                     len(list_intersect(x.shs, y.shs)) AS inter,
                     len(x.shs) AS ca, len(y.shs) AS cb
              FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
        SELECT a, b,
               {sql_round('inter / CAST(ca + cb - inter AS DOUBLE)', 6)} AS jac6
        FROM e WHERE inter / CAST(ca + cb - inter AS DOUBLE) >= 0.5"""

    # deterministic hash split (md5_number_lower == little-endian bytes
    # 8:16 of the md5 digest — mirrored by text.doc_split_batch)
    q["doc_split"] = """
        WITH b AS (SELECT doc_id,
                          CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100
                               AS BIGINT) AS bucket
                   FROM documents)
        SELECT doc_id, bucket,
               CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        FROM b"""

    # sequence packing = windowed prefix sum over the doc_id-ordered
    # token stream (engine side: two-phase distributed scan)
    q["token_pack"] = f"""
        WITH c AS (SELECT doc_id,
                          CAST(len(regexp_extract_all(text, '{TOKEN_RE}'))
                               AS BIGINT) AS n FROM documents),
        w AS (SELECT doc_id, n,
                     sum(n) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n AS prev
              FROM c)
        SELECT doc_id, CAST(prev // {TOKEN_PACK_SEQ_LEN} AS BIGINT) AS seq_id,
               CAST(prev % {TOKEN_PACK_SEQ_LEN} AS BIGINT) AS seq_offset
        FROM w"""

    # ---- relational --------------------------------------------------------
    from .pipelines.relq import EVENT_TYPES
    _piv = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{ty}') AS BIGINT) "
        f"AS n_{ty}" for ty in EVENT_TYPES)
    q["events_pivot"] = f"""
        SELECT user_id, {_piv},
               {sql_round('sum(value)', 2)} AS value_sum2
        FROM events GROUP BY user_id"""

    q["orders_rollup"] = f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               {sql_round('sum(o_totalprice)', 2)} AS total2
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""

    q["q1_pricing"] = f"""
        SELECT l_returnflag, l_linestatus,
               {sql_round('sum(l_quantity)', 2)} AS sum_qty,
               {sql_round('sum(l_extendedprice)', 2)} AS sum_base_price,
               {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
               {sql_round('avg(l_quantity)', 4)} AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus"""

    q["top_revenue_orders"] = f"""
        WITH s AS (SELECT l_orderkey,
                          {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
                   FROM lineitem GROUP BY l_orderkey)
        SELECT l_orderkey, revenue FROM s
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""

    q["nation_revenue"] = f"""
        SELECT n.n_name,
               {sql_round('sum(o.o_totalprice)', 2)} AS total_price,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name"""

    q["top_orders_per_nation"] = f"""
        WITH j AS (SELECT n.n_name, o.o_orderkey, o.o_totalprice
                   FROM orders o
                   JOIN customer c ON c.c_custkey = o.o_custkey
                   JOIN nation n ON n.n_nationkey = c.c_nationkey),
        r AS (SELECT n_name, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY n_name
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey) AS rank
              FROM j)
        SELECT n_name, CAST(rank AS BIGINT) AS rank, o_orderkey,
               {sql_round('o_totalprice', 2)} AS total_price
        FROM r WHERE rank <= 3"""

    # exact ANTI join (TPC-H Q22 core): NOT EXISTS mirror of the
    # hash-co-partitioned anti exchange
    q["customers_no_big_order"] = f"""
        SELECT c.c_custkey, c.c_name, {sql_round('c.c_acctbal', 2)}
                 AS c_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000.0)"""

    # exact daily COUNT(DISTINCT): mirror of the pair-dedup combiner
    q["events_dau"] = """
        SELECT date_trunc('day', ts) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY day"""

    # per-customer running total: ordered-window mirror of the
    # customer-hash segment-cumsum kernel (integer cents so engine and
    # SQL agree regardless of float summation order)
    q["orders_cumsum"] = """
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS order_seq,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                   AS running_cents
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)"""

    # schema-on-read JSON-field stats: regexp_extract is RE2, the same
    # engine as the pipeline's pc.extract_regex, so parses agree
    q["events_props_stats"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS k_sum,
               MIN(k) AS k_min, MAX(k) AS k_max,
               ROUND(CAST(SUM(k) AS DOUBLE) / count(*), 6) AS k_mean
        FROM (SELECT event_type,
                     CAST(regexp_extract(props, '-?[0-9]+', 0) AS BIGINT)
                         AS k
              FROM events)
        GROUP BY event_type"""

    # skyline / Pareto front: NOT EXISTS dominance mirror of the
    # sort + running-max kernel (min price, max size)
    q["part_skyline"] = """
        SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
        FROM part a
        WHERE NOT EXISTS (
          SELECT 1 FROM part b
          WHERE b.p_retailprice <= a.p_retailprice
            AND b.p_size >= a.p_size
            AND (b.p_retailprice < a.p_retailprice
                 OR b.p_size > a.p_size))
        ORDER BY p_partkey"""

    # market-basket pair mining: distinct-pair self-join mirror of the
    # basket-hash clique kernel; same (n desc, pa, pb) top-k tiebreak
    q["basket_pairs"] = """
        WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS pa_key, b.l_partkey AS pb_key,
               CAST(count(*) AS BIGINT) AS n
        FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa_key, pb_key
        ORDER BY n DESC, pa_key, pb_key LIMIT 20"""

    # day-of-week x hour seasonality heatmap (ISO dow)
    q["events_heatmap"] = """
        SELECT CAST(isodow(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

    # weekday-uniformity chi-square per type: with e = N/7 the statistic
    # telescopes to (7*sum(o^2) - N^2)/N — all-integer numerator (zero
    # weekdays drop out of sum(o^2) but the closed form covers them),
    # one float division on both sides
    q["events_weekday_chi2"] = f"""
        WITH c AS (SELECT event_type, isodow(ts) AS dow,
                          CAST(count(*) AS BIGINT) AS o
                   FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
                     CAST(sum(o * o) AS BIGINT) AS so2
              FROM c GROUP BY 1)
        SELECT event_type, n,
               {sql_round('CAST(7 * so2 - n * n AS DOUBLE) '
                          '/ CAST(n AS DOUBLE)', 6)} AS chi2_6
        FROM s"""

    # inter-event gap histogram: lag-window mirror; exact integer log2
    # via binary-string length (no float log on either side)
    q["events_gaps"] = """
        WITH s AS (SELECT user_id, ts,
                          lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
                   FROM events),
        g AS (SELECT (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_s
              FROM s WHERE prev IS NOT NULL)
        SELECT CAST(length(printf('%b', gap_s + 1)) - 1 AS BIGINT)
                   AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM g GROUP BY 1 ORDER BY 1"""

    # exact distributed selection: quantile_disc is the same
    # ceil(n*p)-1 order statistic the two-phase histogram picks
    q["exact_quantiles"] = """
        SELECT 0.5 AS p, quantile_disc(l_extendedprice, 0.5) AS value
        FROM lineitem
        UNION ALL
        SELECT 0.9, quantile_disc(l_extendedprice, 0.9) FROM lineitem
        UNION ALL
        SELECT 0.99, quantile_disc(l_extendedprice, 0.99) FROM lineitem
        ORDER BY p"""

    # grouped exact selection: per-priority quantile_disc mirror
    q["priority_quantiles"] = """
        SELECT o_orderpriority, 0.5 AS p,
               quantile_disc(o_totalprice, 0.5) AS value
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 0.9, quantile_disc(o_totalprice, 0.9)
        FROM orders GROUP BY o_orderpriority
        ORDER BY o_orderpriority, p"""

    # exact 28-day rolling distinct users: range-join mirror of the
    # interval-union difference-array kernel
    q["events_mau"] = """
        WITH days AS (SELECT DISTINCT user_id,
                             date_trunc('day', ts) AS d FROM events),
        cal AS (SELECT DISTINCT d FROM days)
        SELECT c.d AS day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
        FROM cal c JOIN days u
          ON u.d BETWEEN c.d - INTERVAL 27 DAY AND c.d
        GROUP BY c.d"""

    # per-user event-type trigrams: double-lead window mirror of the
    # user-hash shifted-view kernel (same (ts, event_id) stream order)
    q["events_trigrams"] = """
        WITH s AS (SELECT event_type AS t1,
                          lead(event_type, 1) OVER w AS t2,
                          lead(event_type, 2) OVER w AS t3
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id))
        SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE t3 IS NOT NULL
        GROUP BY t1, t2, t3 ORDER BY t1, t2, t3"""

    # per-type daily volume z-score: population stddev window mirror of
    # the bounded (type, day) combiner + vectorized moment merge
    q["events_anomaly"] = f"""
        WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, avg(n) AS m,
                     stddev_pop(n) AS sd
              FROM c GROUP BY 1)
        SELECT c.event_type, c.day, c.n,
               {sql_round('CASE WHEN s.sd > 0 THEN (c.n - s.m) / s.sd'
                          ' ELSE 0.0 END', 6)} AS z
        FROM c JOIN s USING (event_type)"""

    # exact pairwise audience overlap: distinct-pair self-join mirror
    # of the incidence-matrix kernel (same half-away jaccard rounding)
    q["audience_overlap"] = f"""
        WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
             d AS (SELECT event_type, count(*) AS n FROM p GROUP BY 1)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               MIN(da.n) AS users_a, MIN(db.n) AS users_b,
               CAST(count(*) AS BIGINT) AS n_both,
               {sql_round("CAST(count(*) AS DOUBLE)"
                          " / (MIN(da.n) + MIN(db.n) - count(*))", 6)}
                   AS jaccard
        FROM p a
        JOIN p b ON a.user_id = b.user_id AND a.event_type < b.event_type
        JOIN d da ON da.event_type = a.event_type
        JOIN d db ON db.event_type = b.event_type
        GROUP BY a.event_type, b.event_type
        ORDER BY type_a, type_b"""

    # TPC-H Q7 mirror: nation-pair shipping volume by ship year
    q["q7_trade_volume"] = """
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS revenue_cents
        FROM lineitem l, orders o, customer c, supplier s,
             nation ns, nation nc
        WHERE o.o_orderkey = l.l_orderkey
          AND c.c_custkey = o.o_custkey
          AND s.s_suppkey = l.l_suppkey
          AND ns.n_nationkey = s.s_nationkey
          AND nc.n_nationkey = c.c_nationkey
          AND s.s_nationkey <> c.c_nationkey
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

    # TPC-H Q5 mirror: snowflake join + customer==supplier nation
    # equality, integer-cents per-row rounding like the engine
    q["q5_local_supplier"] = """
        SELECT n_name,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS revenue_cents
        FROM lineitem l, orders o, customer c, supplier s, nation n
        WHERE c.c_custkey = o.o_custkey
          AND l.l_orderkey = o.o_orderkey
          AND l.l_suppkey  = s.s_suppkey
          AND c.c_nationkey = s.s_nationkey
          AND s.s_nationkey = n.n_nationkey
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue_cents DESC, n_name"""

    # TPC-H Q3 mirror: 3-way join + group + top-10 (integer-cents
    # revenue, same tiebreak as the engine's bounded top-k merge)
    q["q3_shipping"] = """
        SELECT l_orderkey, revenue_cents, o_orderdate, o_orderpriority
        FROM (
          SELECT l.l_orderkey,
                 SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                * 100) AS BIGINT)) AS revenue_cents,
                 o.o_orderdate, o.o_orderpriority
          FROM lineitem l, orders o, customer c
          WHERE c.c_mktsegment = 'BUILDING'
            AND c.c_custkey = o.o_custkey
            AND l.l_orderkey = o.o_orderkey
            AND o.o_orderdate < TIMESTAMP '1998-06-01'
            AND l.l_shipdate  > TIMESTAMP '1998-06-01'
          GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ) ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"""

    # per-user event-type bigrams: lead() window mirror of the
    # user-hash-partitioned adjacent-pairing kernel
    # debounce dedup: lag-window gap filter, ties broken by event_id on
    # both sides so the keep set is deterministic
    q["events_dedup_window"] = """
        SELECT event_id, user_id, event_type, ts, gap_s FROM (
          SELECT event_id, user_id, event_type, ts,
                 CAST(COALESCE((epoch_us(ts) - epoch_us(lag(ts) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id))) // 1000000, -1)
                      AS BIGINT) AS gap_s
          FROM events)
        WHERE gap_s = -1 OR gap_s >= 86400"""

    # CUSUM changepoint: deviation scaled by m keeps the argmax pure
    # int64; ties earliest day
    q["events_cusum"] = f"""
        WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                          count(*) AS c
                   FROM events GROUP BY 1, 2),
        r AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        days AS (SELECT unnest(range((SELECT lo FROM r),
                                     (SELECT hi FROM r) + 1)) AS day),
        ty AS (SELECT DISTINCT event_type FROM events),
        g AS (SELECT ty.event_type, days.day, COALESCE(e.c, 0) AS c
              FROM ty CROSS JOIN days
              LEFT JOIN e ON e.event_type = ty.event_type
                         AND e.day = days.day),
        w AS (SELECT event_type, day,
                     SUM(c) OVER (PARTITION BY event_type
                                  ORDER BY day) AS cs,
                     SUM(c) OVER (PARTITION BY event_type) AS tot,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) AS t,
                     count(*) OVER (PARTITION BY event_type) AS m
              FROM g),
        s AS (SELECT event_type, day, abs(cs * m - tot * t) AS dev, m,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY abs(cs * m - tot * t)
                                          DESC, day) AS rk
              FROM w)
        SELECT event_type, day AS cp_day,
               {sql_round('CAST(dev AS DOUBLE) / m', 6)} AS cusum6
        FROM s WHERE rk = 1"""

    # lag-1 autocorrelation of per-type daily counts over the global
    # span (missing days 0); 6dp absorbs streaming-corr float diffs
    q["events_autocorr"] = f"""
        WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                          count(*) AS c
                   FROM events GROUP BY 1, 2),
        r AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        days AS (SELECT unnest(range((SELECT lo FROM r),
                                     (SELECT hi FROM r) + 1)) AS day),
        ty AS (SELECT DISTINCT event_type FROM events),
        g AS (SELECT ty.event_type, days.day, COALESCE(e.c, 0) AS c
              FROM ty CROSS JOIN days
              LEFT JOIN e ON e.event_type = ty.event_type
                         AND e.day = days.day),
        l AS (SELECT event_type, c, lag(c) OVER
                (PARTITION BY event_type ORDER BY day) AS pc FROM g)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
               {sql_round('corr(c, pc)', 6)} AS r1_6
        FROM l WHERE pc IS NOT NULL GROUP BY 1"""

    # Benford first digit from the decimal string of integer cents —
    # no float log10 edge on either side
    q["lineitem_benford"] = f"""
        WITH c AS (SELECT l_returnflag,
                          CAST(substr(printf('%d',
                            CAST(ROUND(l_extendedprice * 100) AS BIGINT)),
                            1, 1) AS BIGINT) AS digit
                   FROM lineitem),
        g AS (SELECT l_returnflag, digit, count(*) AS n
              FROM c GROUP BY 1, 2),
        t AS (SELECT l_returnflag, SUM(n) AS tot FROM g GROUP BY 1)
        SELECT g.l_returnflag, g.digit, CAST(g.n AS BIGINT) AS n,
               {sql_round('CAST(g.n AS DOUBLE) / t.tot', 6)} AS share6
        FROM g JOIN t USING (l_returnflag)"""

    # char-unigram entropy: exact integer counts, ordered (ascending
    # char) sum so both sides accumulate the same double sequence
    q["doc_char_entropy"] = f"""
        WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                    FROM documents),
        cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
               FROM ch GROUP BY 1, 2),
        n AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS distinct_ch,
                     sum(cnt * ln(cnt) ORDER BY c) AS s
              FROM cc GROUP BY doc_id)
        SELECT doc_id, n AS n_ch, distinct_ch,
               {sql_round('ln(n) - s / n', 6)} AS ent6
        FROM n"""

    # full-outer purchase/order reconciliation
    q["purchase_reconciliation"] = """
        WITH e AS (SELECT user_id AS id, count(*) AS n_p FROM events
                   WHERE event_type = 'purchase' GROUP BY 1),
        o AS (SELECT o_custkey AS id, count(*) AS n_o FROM orders
              GROUP BY 1)
        SELECT COALESCE(e.id, o.id) AS id,
               CAST(COALESCE(n_p, 0) AS BIGINT) AS n_purchases,
               CAST(COALESCE(n_o, 0) AS BIGINT) AS n_orders,
               CASE WHEN e.id IS NULL THEN 'orders_only'
                    WHEN o.id IS NULL THEN 'events_only'
                    ELSE 'both' END AS status
        FROM e FULL OUTER JOIN o ON e.id = o.id"""

    # exact-quintile RFM segmentation: integer cents / integer day
    # floors; score = 1 + #thresholds strictly below (quantile_disc
    # thresholds, recency inverted), the deciles-oracle pattern
    q["user_rfm"] = """
        WITH nw AS (SELECT max(ts) AS n FROM events),
        u AS (SELECT user_id,
                CAST((epoch_us((SELECT n FROM nw)) - epoch_us(max(ts)))
                     // 86400000000 AS BIGINT) AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(ROUND(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS monetary_cents
              FROM events GROUP BY user_id),
        t AS (SELECT
                quantile_disc(CAST(recency_days AS DOUBLE),
                              [0.2, 0.4, 0.6, 0.8]) AS tr,
                quantile_disc(CAST(frequency AS DOUBLE),
                              [0.2, 0.4, 0.6, 0.8]) AS tf,
                quantile_disc(CAST(monetary_cents AS DOUBLE),
                              [0.2, 0.4, 0.6, 0.8]) AS tm FROM u)
        SELECT user_id, recency_days, frequency, monetary_cents,
          CAST(5 - (SELECT count(*) FROM unnest((SELECT tr FROM t))
                    AS z(v) WHERE z.v < CAST(recency_days AS DOUBLE))
               AS BIGINT) AS r_score,
          CAST(1 + (SELECT count(*) FROM unnest((SELECT tf FROM t))
                    AS z(v) WHERE z.v < CAST(frequency AS DOUBLE))
               AS BIGINT) AS f_score,
          CAST(1 + (SELECT count(*) FROM unnest((SELECT tm FROM t))
                    AS z(v) WHERE z.v < CAST(monetary_cents AS DOUBLE))
               AS BIGINT) AS m_score
        FROM u"""

    # inter-arrival regularity (bot screen): exact int64 second gaps,
    # cv from one sqrt + one division of exact integer moments
    q["user_gap_cv"] = f"""
        WITH s AS (SELECT user_id,
                     (epoch_us(ts) - epoch_us(lag(ts) OVER w))
                       // 1000000 AS gap_s
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                     CAST(sum(gap_s) AS BIGINT) AS total_s,
                     CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
              FROM s WHERE gap_s IS NOT NULL
              GROUP BY user_id HAVING count(*) >= 2)
        SELECT user_id, n_gaps, total_s,
               CASE WHEN total_s = 0 THEN 0.0 ELSE
                 {sql_round('sqrt(n_gaps * s2 - total_s * total_s) / total_s', 6)}
               END AS cv6
        FROM g"""

    # fulfillment lag histogram: integer day arithmetic both sides
    q["order_fulfillment_lag"] = """
        WITH m AS (SELECT l_orderkey, max(l_shipdate) AS sd
                   FROM lineitem GROUP BY 1)
        SELECT o_orderpriority,
               epoch_us(sd) // 86400000000
                 - epoch_us(o_orderdate) // 86400000000 AS lag_days,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN m ON m.l_orderkey = o_orderkey
        GROUP BY 1, 2"""

    # per-user transition entropy; 6dp absorbs float sum order
    q["user_transition_entropy"] = f"""
        WITH s AS (SELECT user_id, event_type, lead(event_type) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                   FROM events),
        p AS (SELECT user_id, event_type, nxt, count(*) AS c
              FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
        n AS (SELECT user_id, SUM(c) AS n FROM p GROUP BY 1)
        SELECT p.user_id, CAST(max(n.n) AS BIGINT) AS n_trans,
               {sql_round('-SUM((CAST(c AS DOUBLE) / n.n) * ln(CAST(c AS DOUBLE) / n.n))', 6)}
                   AS h6
        FROM p JOIN n USING (user_id) GROUP BY 1"""

    # exact sliding-window peak: the quadratic self-join is the honest
    # independent plan (engine is searchsorted); inclusive both ends
    q["events_peak_rate"] = """
        SELECT user_id, CAST(max(c) AS BIGINT) AS peak_n FROM (
          SELECT a.user_id, a.event_id, count(*) AS c
          FROM events a JOIN events b ON a.user_id = b.user_id
           AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 3600 SECOND
          GROUP BY 1, 2)
        GROUP BY 1"""

    # burstiness: lag-window gaps -> stddev_samp/avg; 6dp absorbs the
    # moment-formula-vs-streaming float differences
    q["events_burstiness"] = f"""
        WITH g AS (SELECT user_id,
                          (epoch_us(ts) - epoch_us(lag(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)))
                            / 1e6 AS gap_s
                   FROM events),
        s AS (SELECT user_id, count(*) AS n_gaps,
                     stddev_samp(gap_s) AS sd, avg(gap_s) AS mu
              FROM g WHERE gap_s IS NOT NULL GROUP BY 1
              HAVING count(*) >= 2)
        SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
               {sql_round('CASE WHEN sd + mu > 0 THEN (sd - mu) / (sd + mu) ELSE 0.0 END', 6)}
                   AS burst6
        FROM s"""

    # ABC / Lorenz classification: integer cents + integer boundary
    # rule (100 * cum_before < pct * total) make the classes exact;
    # (rc DESC, c) keys are unique so the window cum is deterministic
    q["customer_abc"] = f"""
        WITH r AS (SELECT o_custkey AS c,
                          SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                            AS rc
                   FROM orders GROUP BY 1),
        w AS (SELECT c, rc,
                     SUM(rc) OVER (ORDER BY rc DESC, c
                                   ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(rc) OVER () AS tot
              FROM r),
        k AS (SELECT CASE WHEN 100 * (cum - rc) < 80 * tot THEN 'A'
                          WHEN 100 * (cum - rc) < 95 * tot THEN 'B'
                          ELSE 'C' END AS abc_class, rc, tot FROM w)
        SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(SUM(rc) AS BIGINT) AS revenue_cents,
               {sql_round('CAST(SUM(rc) AS DOUBLE) / CAST(max(tot) AS DOUBLE)', 6)}
                   AS share6
        FROM k GROUP BY 1"""

    # trailing calendar-range moving average; integer daily counts make
    # SUM/AVG exact so the frame mean is bit-identical on both sides
    q["events_moving_avg"] = f"""
        WITH c AS (SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP)
                          AS day, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2)
        SELECT event_type, day, n,
               {sql_round("avg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)", 6)}
                   AS ma6
        FROM c"""

    # two-pass standardize: threshold on the ROUNDED z on both sides;
    # stddev_samp NULL (n=1 group) and sd=0 both define z=0
    q["events_zscore"] = f"""
        WITH st AS (SELECT event_type, avg(value) AS m,
                           stddev_samp(value) AS sd
                    FROM events GROUP BY 1)
        SELECT e.event_id, e.event_type,
               {sql_round('CASE WHEN st.sd > 0 THEN (e.value - st.m) / st.sd ELSE 0.0 END', 6)} AS z6,
               ABS(z6) > 3.0 AS is_outlier
        FROM events e JOIN st USING (event_type)"""

    # per-type OLS of value on days-since-epoch0 (small abscissa on
    # purpose; see pipelines.relq.events_trend)
    q["events_trend"] = f"""
        WITH d AS (SELECT event_type,
                          CAST(date_diff('day', DATE '1995-01-01',
                                         CAST(ts AS DATE)) AS DOUBLE) AS x,
                          value AS y FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               {sql_round('COALESCE(regr_slope(y, x), 0.0)', 6)} AS slope6,
               {sql_round('avg(y) - COALESCE(regr_slope(y, x), 0.0) * avg(x)', 4)}
                   AS intercept4
        FROM d GROUP BY 1"""

    q["events_transitions"] = """
        WITH s AS (SELECT event_type,
                          lead(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                            AS next_type
                   FROM events)
        SELECT event_type AS prev_type, next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY prev_type, next_type"""

    q["events_window"] = f"""
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
               CAST(count(*) AS BIGINT) AS n,
               {sql_round('sum(value)', 4)} AS sum_value
        FROM events GROUP BY event_type, 2"""

    q["events_sliding_window"] = f"""
        WITH e AS (SELECT event_type, value,
                          epoch_us(ts) // 1000000 AS sec FROM events),
        x AS (SELECT event_type, value,
                     unnest(range((sec - 3600) // 1800 + 1,
                                  sec // 1800 + 1)) AS k
              FROM e)
        SELECT event_type, CAST(k * 1800 AS BIGINT) AS window_start_s,
               CAST(count(*) AS BIGINT) AS n,
               {sql_round('sum(value)', 4)} AS sum_value
        FROM x GROUP BY event_type, k"""

    # ASOF join: each click's latest preceding purchase per user —
    # engine = co-partitioned searchsorted kernel; oracle = native ASOF
    q["events_asof"] = f"""
        WITH l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
        r AS (SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase')
        SELECT l.event_id, CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
               COALESCE(r.event_id, -1) AS prev_event_id,
               COALESCE({sql_round('r.value', 6)}, -1.0) AS prev_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts"""

    q["sessionize"] = f"""
        WITH o AS (SELECT user_id, ts,
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                   FROM events)
        SELECT user_id,
               CAST(1 + sum(CASE WHEN prev IS NOT NULL
                                  AND ts - prev > INTERVAL {SESSION_GAP_MIN} MINUTE
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM o GROUP BY user_id"""

    # events_funnel: greedy first-occurrence semantics are a chain of
    # windowed mins — each step joins on the previous step's anchor
    from .pipelines.relq import FUNNEL_STEPS, FUNNEL_WINDOW_S
    s1, s2, s3 = FUNNEL_STEPS
    q["events_funnel"] = f"""
        WITH f1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = '{s1}' GROUP BY user_id),
             f2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                    JOIN f1 USING (user_id)
                    WHERE e.event_type = '{s2}' AND e.ts > f1.t1
                      AND e.ts <= f1.t1 + INTERVAL {FUNNEL_WINDOW_S} SECOND
                    GROUP BY e.user_id),
             f3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                    JOIN f2 USING (user_id)
                    WHERE e.event_type = '{s3}' AND e.ts > f2.t2
                      AND e.ts <= f2.t2 + INTERVAL {FUNNEL_WINDOW_S} SECOND
                    GROUP BY e.user_id)
        SELECT f1.user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS depth,
               CAST(CASE WHEN t3 IS NOT NULL
                         THEN (epoch_us(t3) - epoch_us(t1)) // 1000
                         ELSE -1 END AS BIGINT) AS dur_ms
        FROM f1 LEFT JOIN f2 USING (user_id) LEFT JOIN f3 USING (user_id)"""

    # events_retention: cohort = UTC day of first event; integer day
    # arithmetic on both sides (epoch_us // 86400e6)
    q["events_retention"] = """
        WITH d AS (SELECT user_id,
                          epoch_us(ts) // 86400000000 AS day FROM events),
             f AS (SELECT user_id, min(day) AS cohort_day FROM d
                   GROUP BY user_id),
             a AS (SELECT DISTINCT user_id, day FROM d)
        SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
               CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY f.cohort_day, a.day - f.cohort_day"""

    # ---- deterministic sampling / filtering family (pipelines/sample.py,
    # pipelines/filtering.py, relational.bloom_semi_join): every decision
    # keys on md5_number_lower so the SQL reproduces the EXACT rows ------
    md5i = sql_md5_num_lower("doc_id")
    q["det_sample"] = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {md5i} % 100 < 20"""

    q["stratified_sample"] = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {md5i} % 100 < CASE WHEN lang = 'en' THEN 60
                                  WHEN lang = 'es' THEN 30 ELSE 10 END"""

    q["src_quota_sample"] = f"""
        SELECT source, doc_id, lang, n_chars, rk FROM (
          SELECT source, doc_id, lang, n_chars,
                 CAST(row_number() OVER (
                      PARTITION BY source
                      ORDER BY {md5i}, doc_id) AS BIGINT) AS rk
          FROM documents) WHERE rk <= 10"""

    q["priority_sample"] = f"""
        SELECT doc_id, lang, n_chars FROM documents
        ORDER BY {md5i}, doc_id LIMIT 64"""

    # mixture rebalance: per-source keep thresholds derived from target
    # mixture weights over a char budget; the rate arithmetic keeps the
    # exact association of pipelines/sample.mixture_rates (module
    # docstring: float discipline) so FLOOR agrees bit-for-bit
    wvals = ", ".join(f"('{s}', {w})" for s, w in MIXTURE_WEIGHTS)
    q["mixture_sample"] = f"""
        WITH avail AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS a
                       FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(a) AS DOUBLE) AS t FROM avail),
        w(source, wt) AS (VALUES {wvals}),
        thr AS (SELECT avail.source,
                       CAST(FLOOR(LEAST(1.0, (wt * {MIXTURE_BUDGET_FRAC} * t) / a)
                                  * 1000) AS BIGINT) AS th
                FROM avail JOIN w ON avail.source = w.source CROSS JOIN tot)
        SELECT d.doc_id, d.source FROM documents d
        JOIN thr ON d.source = thr.source
        WHERE {md5i} % 1000 < th"""

    # sample_n=101 puts each q on an integer order-statistic index, so
    # quantile_cont interpolates nothing and numpy agrees bit-exactly
    qs_sql = ", ".join(f"CAST({x} AS DOUBLE)" for x in (0.25, 0.5, 0.9))
    q["approx_quantiles"] = f"""
        WITH s AS (SELECT n_chars FROM documents
                   ORDER BY {md5i}, doc_id LIMIT 101),
        qq AS (SELECT unnest([{qs_sql}]) AS q,
                      unnest(quantile_cont(n_chars,
                             [{qs_sql}])) AS v FROM s)
        SELECT q, {sql_round('v', 6)} AS val6 FROM qq"""

    q["grouped_quantiles"] = f"""
        WITH r AS (SELECT lang, n_chars,
                          row_number() OVER (PARTITION BY lang
                              ORDER BY {md5i}, doc_id) AS rn
                   FROM documents),
        s AS (SELECT lang, n_chars FROM r WHERE rn <= 101),
        qq AS (SELECT lang, unnest([{', '.join(f'CAST({x} AS DOUBLE)' for x in (0.5, 0.9))}]) AS q,
                      unnest(quantile_cont(n_chars,
                             [{', '.join(f'CAST({x} AS DOUBLE)' for x in (0.5, 0.9))}])) AS v
               FROM s GROUP BY lang)
        SELECT lang, q, {sql_round('v', 6)} AS val6 FROM qq"""

    # bloom prefilter affects cost only: the result is the exact semi join
    q["bloom_semi_orders"] = """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')"""

    from .pipelines.filtering import DUP_WORD_MAX, REDACT_PATTERNS, TOP_BIGRAM_MAX
    q["doc_repetition"] = f"""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                      FROM documents),
        base AS (SELECT doc_id, len(tk) AS nw, len(list_distinct(tk)) AS nd
                 FROM toks),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(tk)),
                             i -> tk[i] || ' ' || tk[i+1])) AS b
               FROM toks),
        bc AS (SELECT doc_id, max(n) AS mx FROM
                 (SELECT doc_id, b, count(*) AS n FROM bg
                  GROUP BY doc_id, b) GROUP BY doc_id),
        j AS (SELECT base.doc_id, nw, nd, coalesce(mx, 0) AS mx
              FROM base LEFT JOIN bc ON base.doc_id = bc.doc_id)
        SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
               {sql_round('CASE WHEN nw > 0 THEN 1.0 - nd / CAST(nw AS DOUBLE) ELSE 0.0 END', 6)} AS dup_word6,
               {sql_round('CASE WHEN nw > 1 THEN mx / CAST(nw - 1 AS DOUBLE) ELSE 0.0 END', 6)} AS top_bigram6,
               (dup_word6 <= {DUP_WORD_MAX!r} AND
                top_bigram6 <= {TOP_BIGRAM_MAX!r}) AS keep
        FROM j"""

    # per-user argmax (latest event; event_id tie-break) — window dual
    # of the engine's two-level argmax combiner
    q["events_latest"] = """
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_type
        FROM (SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rk FROM events)
        WHERE rk = 1"""

    red = "props"
    for pat, rep in REDACT_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    q["pii_redact"] = f"SELECT event_id, {red} AS props FROM events"

    # RANGE join (count form): follows the ASOF co-partition plan with a
    # two-probe merged-scan kernel; [ts, ts+1h) half-open
    q["events_range_join"] = """
        WITH s AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'signup'),
        c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        SELECT s.event_id, CAST(epoch_us(s.ts) AS BIGINT) AS ts_us,
               CAST(count(c.ts) AS BIGINT) AS n_follow
        FROM s LEFT JOIN c ON s.user_id = c.user_id
          AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 24 HOUR
        GROUP BY s.event_id, s.ts"""

    # split()-equivalent tokens (engine: text._tokens_flat); per-token
    # ln(N/df) mean — the df small side is a distributed combiner + one
    # broadcast on the engine side
    split_toks = "list_filter(string_split(lower(text), ' '), _w -> _w <> '')"
    # corpus frequency spectrum: count-of-counts mirror of the
    # word-hash exact counts (freq 0 = vocab size, -1 = token total)
    q["vocab_stats"] = f"""
        WITH toks AS (SELECT unnest({split_toks}) AS w FROM documents),
        wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        spec AS (SELECT n AS freq, CAST(count(*) AS BIGINT) AS n_words
                 FROM wc WHERE n BETWEEN 1 AND 10 GROUP BY n),
        fr AS (SELECT unnest(range(1, 11)) AS freq)
        SELECT CAST(fr.freq AS BIGINT) AS freq,
               COALESCE(spec.n_words, 0) AS n_words
        FROM fr LEFT JOIN spec ON spec.freq = fr.freq
        UNION ALL SELECT 0, CAST(count(*) AS BIGINT) FROM wc
        UNION ALL SELECT -1, CAST(SUM(n) AS BIGINT) FROM wc
        ORDER BY freq"""

    # bigram PMI collocations: unnest-window mirror of the bigram-hash
    # exchange; identical (n * total) / (n1 * n2) term order before ln
    # per-doc shingle novelty: min-owner fold, integer counts exact
    q["doc_novelty"] = f"""
        WITH toks AS (SELECT doc_id, {split_toks} AS tk FROM documents),
        tg AS (SELECT DISTINCT doc_id,
                      tk[u.i] || ' ' || tk[u.i + 1] || ' ' || tk[u.i + 2]
                        AS s
               FROM toks, unnest(range(1, len(tk) - 1)) AS u(i)),
        own AS (SELECT s, min(doc_id) AS doc_id FROM tg GROUP BY 1),
        tot AS (SELECT doc_id, count(*) AS n_sh FROM tg GROUP BY 1),
        nov AS (SELECT doc_id, count(*) AS n_novel FROM own GROUP BY 1)
        SELECT t.doc_id, CAST(t.n_sh AS BIGINT) AS n_shingles,
               CAST(COALESCE(nov.n_novel, 0) AS BIGINT) AS n_novel,
               {sql_round('COALESCE(nov.n_novel, 0) / CAST(t.n_sh AS DOUBLE)', 6)}
                   AS novelty6
        FROM tot t LEFT JOIN nov USING (doc_id)"""

    # Church-Gale burstiness: exact integer cf/df, one float division
    q["term_burstiness"] = f"""
        WITH toks AS (SELECT doc_id, {split_toks} AS tk FROM documents),
        t AS (SELECT doc_id, unnest(tk) AS w FROM toks),
        s AS (SELECT w AS token, CAST(count(*) AS BIGINT) AS cf,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM t GROUP BY 1)
        SELECT token, cf, df,
               {sql_round('CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)', 6)}
                   AS burst6
        FROM s WHERE cf >= 5"""

    q["collocations"] = f"""
        WITH toks AS (SELECT {split_toks} AS tk FROM documents),
        bg AS (SELECT tk[u.i] AS w1, tk[u.i + 1] AS w2
               FROM toks, unnest(range(1, len(tk))) AS u(i)),
        bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
               FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
        uc AS (SELECT w, CAST(count(*) AS BIGINT) AS un
               FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY 1),
        tot AS (SELECT CAST(SUM(un) AS DOUBLE) AS t FROM uc),
        p AS (SELECT bc.w1, bc.w2, bc.n,
                     ln((CAST(bc.n AS DOUBLE) * tot.t)
                        / (CAST(a.un AS DOUBLE) * CAST(b.un AS DOUBLE)))
                         AS pmi_raw
              FROM bc JOIN uc a ON a.w = bc.w1
                      JOIN uc b ON b.w = bc.w2, tot)
        SELECT CAST(row_number() OVER (ORDER BY pmi_raw DESC, w1, w2)
                    AS BIGINT) AS rank,
               w1, w2, n, {sql_round('pmi_raw', 6)} AS pmi
        FROM p ORDER BY pmi_raw DESC, w1, w2 LIMIT 20"""

    # grouped exact heavy hitters: row_number window mirror of the
    # token-hash-exact counts + per-partition top-k (same tiebreak)
    q["lang_top_tokens"] = f"""
        WITH toks AS (SELECT lang, unnest({split_toks}) AS w
                      FROM documents),
        c AS (SELECT lang, w AS token, CAST(count(*) AS BIGINT) AS n
              FROM toks GROUP BY 1, 2),
        r AS (SELECT lang, token, n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, token) AS rk
              FROM c)
        SELECT lang, CAST(rk AS BIGINT) AS rank, token, n
        FROM r WHERE rk <= 10"""

    # per-doc top-k keywords: identical double product both sides so
    # (score DESC, term ASC) row_number is deterministic
    q["keyword_extract"] = f"""
        WITH toks AS (SELECT doc_id, unnest({split_toks}) AS w
                      FROM documents),
        df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
        sc AS (SELECT doc_id, w, tf * ln(n.n / df.df) AS s
               FROM tf JOIN df USING (w) CROSS JOIN n),
        r AS (SELECT doc_id, w, s, row_number() OVER
                (PARTITION BY doc_id ORDER BY s DESC, w) AS rank
              FROM sc)
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS term,
               {sql_round('s', 6)} AS score6
        FROM r WHERE rank <= 3"""

    q["tfidf_score"] = f"""
        WITH toks AS (SELECT doc_id, unnest({split_toks}) AS w
                      FROM documents),
        df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        s AS (SELECT doc_id, sum(ln(n.n / df.df)) AS sm,
                     count(*) AS nt
              FROM toks JOIN df USING (w) CROSS JOIN n GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE({sql_round('sm / nt', 6)}, 0.0) AS tfidf6
        FROM documents d LEFT JOIN s USING (doc_id)"""

    # tfidf under a BITING top-50 vocab cap: top-V by (df desc, word),
    # out-of-vocab tokens score ln N — the capped contract, gated
    q["tfidf_capped"] = f"""
        WITH toks AS (SELECT doc_id, unnest({split_toks}) AS w
                      FROM documents),
        df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
        v AS (SELECT w, df FROM df ORDER BY df DESC, w LIMIT 50),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        s AS (SELECT doc_id,
                     sum(CASE WHEN v.w IS NULL THEN ln(n.n)
                              ELSE ln(n.n / v.df) END) AS sm,
                     count(*) AS nt
              FROM toks LEFT JOIN v ON v.w = toks.w CROSS JOIN n
              GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE({sql_round('sm / nt', 6)}, 0.0) AS tfidf6
        FROM documents d LEFT JOIN s USING (doc_id)"""

    # Okapi BM25 vs the engine's fixed query set; idf/avgdl/N mirror the
    # combiner-broadcast stats (scoring.bm25_score)
    from .pipelines.scoring import BM25_B, BM25_K1, BM25_QUERY
    _qvals = ", ".join(f"('{w}')" for w in BM25_QUERY)
    q["bm25_score"] = f"""
        WITH qt(w) AS (VALUES {_qvals}),
        toks AS (SELECT doc_id, unnest({split_toks}) AS w FROM documents),
        dl AS (SELECT d.doc_id,
                      CAST(COALESCE(t.c, 0) AS DOUBLE) AS dl
               FROM documents d LEFT JOIN
                 (SELECT doc_id, count(*) AS c FROM toks GROUP BY doc_id) t
                 USING (doc_id)),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      sum(dl) / count(*) AS avgdl FROM dl),
        df AS (SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
               FROM toks JOIN qt USING (w) GROUP BY w),
        tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
               FROM toks JOIN qt USING (w) GROUP BY doc_id, w),
        sc AS (SELECT tf.doc_id,
                      sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({BM25_K1} + 1.0)
                          / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                             + {BM25_B} * dl.dl / st.avgdl))) AS s
               FROM tf JOIN df USING (w) JOIN dl USING (doc_id)
               CROSS JOIN st GROUP BY tf.doc_id)
        SELECT d.doc_id, COALESCE({sql_round('sc.s', 6)}, 0.0) AS bm25_6
        FROM documents d LEFT JOIN sc USING (doc_id)"""

    # add-one-smoothed bigram LM self-trained on the corpus; the ordered
    # unnest (generate_subscripts) makes the consecutive-pair join the
    # SQL dual of the engine's shifted-array bigram stream
    q["lm_score"] = f"""
        WITH lt AS (SELECT doc_id, {split_toks} AS lf FROM documents),
        toks AS (SELECT doc_id, unnest(lf) AS w,
                        generate_subscripts(lf, 1) AS i FROM lt),
        pairs AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
                  FROM toks a JOIN toks b
                  ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        big AS (SELECT w1, w2, count(*) AS n12 FROM pairs GROUP BY w1, w2),
        uni AS (SELECT w AS w1, count(*) AS n1 FROM toks GROUP BY w),
        v AS (SELECT count(DISTINCT w) AS vs FROM toks),
        sc AS (SELECT p.doc_id,
                      LN((b.n12 + 1.0) / (u.n1 + (SELECT vs FROM v))) AS lp
               FROM pairs p
               JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
               JOIN uni u ON u.w1 = p.w1),
        agg AS (SELECT doc_id, count(*) AS nb, sum(lp) AS s
                FROM sc GROUP BY doc_id)
        SELECT d.doc_id, CAST(COALESCE(agg.nb, 0) AS BIGINT) AS n_bigrams,
               COALESCE({sql_round('agg.s', 6)}, 0.0) AS lm6
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id"""

    # trigram-shingle overlap of every train doc against the eval set
    # (doc_id % 100 == 7); string shingles here, crc-hashed shingles in
    # the engine — distinct counts equal barring 2^-64 collisions (the
    # ngram_jaccard_exact precedent). Assumes every doc has >= 3 tokens
    # (synthetic corpus does); the engine additionally _pad-extends
    # shorter docs.
    q["contamination"] = f"""
        WITH toks AS (SELECT doc_id, {split_toks} AS tk FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                      AS shs
               FROM toks),
        ev AS (SELECT list(DISTINCT s) AS es FROM
                 (SELECT unnest(shs) AS s FROM sh WHERE doc_id % 100 = 7)),
        m AS (SELECT doc_id, len(shs) AS n_sh,
                     len(list_intersect(shs, ev.es)) AS n_hit
              FROM sh CROSS JOIN ev WHERE doc_id % 100 <> 7)
        SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
               CAST(n_hit AS BIGINT) AS n_overlap,
               {sql_round('n_hit / CAST(n_sh AS DOUBLE)', 6)} AS overlap6,
               (overlap6 >= 0.5) AS contaminated
        FROM m"""

    # exact d x d sample covariance from the engine's moment combiner;
    # oracle: covar_samp over positionally-unnested components (both
    # sides compute in float64; values rounded at 6dp)
    q["embed_covariance"] = f"""
        WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                          unnest(range(1, len(embedding) + 1)) AS i
                   FROM embeddings)
        SELECT CAST(a.i - 1 AS BIGINT) AS i, CAST(b.i - 1 AS BIGINT) AS j,
               {sql_round('covar_samp(a.x, b.x)', 6)} AS cov6
        FROM e a JOIN e b USING (vec_id) GROUP BY a.i, b.i"""

    # local clustering coefficient: per-vertex triangle counts by the
    # declarative triple join (the engine runs oriented wedge closure);
    # identical (2.0 * t) / (d * (d - 1)) term order before the round
    q["way_clustering_coef"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b
                 ON a.ref = b.ref AND a.way_id < b.way_id),
        deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                FROM (SELECT a AS v FROM ed UNION ALL SELECT b FROM ed)
                GROUP BY v),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ed e1 JOIN ed e2 ON e2.a = e1.b
                           JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        tc AS (SELECT v, CAST(count(*) AS BIGINT) AS t
               FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
                     UNION ALL SELECT z FROM tri) GROUP BY v)
        SELECT deg.v AS way_id, deg.d AS deg,
               COALESCE(tc.t, 0) AS n_tri,
               CASE WHEN deg.d < 2 THEN 0.0 ELSE
                 {sql_round('2.0 * COALESCE(tc.t, 0) '
                            '/ (CAST(deg.d AS DOUBLE) * (deg.d - 1))', 6)}
               END AS lcc6
        FROM deg LEFT JOIN tc ON tc.v = deg.v"""

    # dyadic-exact EWMA (alpha = 1/2, K = 24): integer s_scaled
    # accumulated both sides, ONE float division by the exact 2^24
    q["events_ewma"] = f"""
        WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
                          CAST(count(*) AS BIGINT) AS c
                   FROM events GROUP BY 1, 2),
        mx AS (SELECT max(day) AS dmax FROM c),
        w AS (SELECT event_type, c.c,
                     CAST(datediff('day', dmax, day) + 23 AS BIGINT) AS i
              FROM c, mx WHERE datediff('day', dmax, day) > -24),
        s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(c * (CAST(1 AS BIGINT) << i)) AS BIGINT)
                         AS s_scaled
              FROM w GROUP BY 1)
        SELECT event_type, n_days, s_scaled,
               {sql_round(f'CAST(s_scaled AS DOUBLE) / {float(2 ** 24)!r}', 6)}
                   AS ewma6
        FROM s"""

    # spatial colocation PMI over distinct (cell, amenity-value) presence
    # sets; identical integer products and ONE double division before ln
    q["amenity_colocation"] = f"""
        WITH tv AS (SELECT {tiles.sql_cell_id('lon', 'lat', COLOC_RES)}
                        AS cell,
                        (list_filter(tags, _t -> _t.key = 'amenity')[1])
                            .value AS val
                    FROM {nodes}
                    WHERE len(list_filter(tags,
                              _t -> _t.key = 'amenity')) > 0),
        cv AS (SELECT DISTINCT cell, val FROM tv),
        qq AS (SELECT CAST(count(DISTINCT cell) AS BIGINT) AS q FROM cv),
        pres AS (SELECT val, CAST(count(*) AS BIGINT) AS n
                 FROM cv GROUP BY 1),
        pr AS (SELECT x.val AS a, y.val AS b, CAST(count(*) AS BIGINT)
                   AS n_ab
               FROM cv x JOIN cv y ON x.cell = y.cell AND x.val < y.val
               GROUP BY 1, 2)
        SELECT pr.a, pr.b, pr.n_ab,
               {sql_round('ln(CAST(pr.n_ab * qq.q AS DOUBLE) '
                          '/ CAST(na.n * nb.n AS DOUBLE))', 6)} AS pmi6
        FROM pr, qq
        JOIN pres na ON na.val = pr.a
        JOIN pres nb ON nb.val = pr.b"""

    # linear-interpolation as-of: the window-lead mirror of the engine's
    # sorted-searchsorted bracket; identical lerp op order before round
    q["events_interp"] = f"""
        WITH e AS (SELECT event_type, ts, value,
                          lead(ts) OVER w AS nts,
                          lead(value) OVER w AS nval
                   FROM events
                   WINDOW w AS (PARTITION BY event_type
                                ORDER BY ts, event_id)),
        r AS (SELECT event_type, min(ts) AS t0, max(ts) AS t1
              FROM events GROUP BY 1),
        g AS (SELECT event_type,
                     unnest(generate_series(
                         date_trunc('day', t0) + INTERVAL 1 DAY,
                         date_trunc('day', t1), INTERVAL 1 DAY)) AS day
              FROM r)
        SELECT g.event_type, g.day,
               {sql_round('CAST(e.value AS DOUBLE) '
                          '+ CAST(epoch_us(g.day) - epoch_us(e.ts) AS DOUBLE) '
                          '/ CAST(epoch_us(e.nts) - epoch_us(e.ts) AS DOUBLE) '
                          '* (e.nval - e.value)', 6)} AS interp6
        FROM g JOIN e ON e.event_type = g.event_type
                     AND e.ts < g.day AND e.nts >= g.day"""

    # caption edit-distance near-dup pairs within digit-collapsed
    # template groups; DuckDB's levenshtein is the independent scalar
    # reference for the engine's banded vectorized DP
    q["caption_edit_pairs"] = f"""
        WITH c AS (SELECT image_id, caption,
                          regexp_replace(caption, '[0-9]+', '#', 'g')
                              AS tpl
                   FROM {images}
                   WHERE CAST(substr(image_id, 4) AS BIGINT)
                         < {CAPTION_PAIR_CAP})
        SELECT x.image_id AS a, y.image_id AS b,
               CAST(levenshtein(x.caption, y.caption) AS BIGINT) AS lev
        FROM c x JOIN c y ON x.tpl = y.tpl AND x.image_id < y.image_id
        WHERE levenshtein(x.caption, y.caption) <= {CAPTION_MAX_LEV}"""

    # per-cell tag-value diversity: doc_char_entropy's ordered-aggregate
    # determinism contract (ascending value order both sides)
    q["cell_tag_entropy"] = f"""
        WITH tv AS (SELECT {tiles.sql_cell_id('lon', 'lat', ENTROPY_RES)}
                        AS cell,
                        (list_filter(tags, _t -> _t.key = 'amenity')[1])
                            .value AS val
                    FROM {nodes}
                    WHERE len(list_filter(tags,
                              _t -> _t.key = 'amenity')) > 0),
        cc AS (SELECT cell, val, CAST(count(*) AS BIGINT) AS cnt
               FROM tv GROUP BY 1, 2),
        n AS (SELECT cell, CAST(sum(cnt) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS n_values,
                     sum(cnt * ln(cnt) ORDER BY val) AS s
              FROM cc GROUP BY cell)
        SELECT cell, n AS n_nodes, n_values,
               {sql_round('ln(n) - s / n', 6)} AS ent6
        FROM n"""

    # friend-of-friend reach: distinct 2-hop candidates minus direct
    # neighbours via NOT EXISTS (the engine runs a co-partitioned
    # sorted-merge anti join)
    q["way_two_hop"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b
                 ON a.ref = b.ref AND a.way_id < b.way_id),
        ed2 AS (SELECT a AS u, b AS v FROM ed
                UNION ALL SELECT b, a FROM ed),
        deg AS (SELECT u AS v, CAST(count(*) AS BIGINT) AS d
                FROM ed2 GROUP BY 1),
        p AS (SELECT DISTINCT x.v AS x, y.v AS y
              FROM ed2 x JOIN ed2 y ON x.u = y.u AND x.v <> y.v),
        two AS (SELECT p.x, p.y FROM p
                WHERE NOT EXISTS (SELECT 1 FROM ed2 e
                                  WHERE e.u = p.x AND e.v = p.y)),
        n2 AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS n2
               FROM two GROUP BY 1)
        SELECT deg.v AS way_id, deg.d AS deg,
               COALESCE(n2.n2, 0) AS n_two_hop
        FROM deg LEFT JOIN n2 ON n2.v = deg.v"""

    # corpus isotropy probe: integer-lattice quantization makes dots and
    # norms exact int64; one sqrt + one division + one floor both sides
    q["embed_angular_hist"] = f"""
        WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                          unnest(range(1, len(embedding) + 1)) AS i
                   FROM embeddings WHERE vec_id < {ANGULAR_CAP}),
        qv AS (SELECT vec_id, i,
                      CAST({sql_round('CAST(x AS DOUBLE) * 512.0', 0)}
                           AS BIGINT) AS q
               FROM e),
        d AS (SELECT a.vec_id AS a, b.vec_id AS b,
                     CAST(sum(a.q * b.q) AS BIGINT) AS dot
              FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id < b.vec_id
              GROUP BY 1, 2),
        nn AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n
               FROM qv GROUP BY 1),
        c AS (SELECT CAST(d.dot AS DOUBLE)
                     / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS cos
              FROM d JOIN nn na ON na.vec_id = d.a
                     JOIN nn nb ON nb.vec_id = d.b),
        h AS (SELECT CAST(LEAST(GREATEST(FLOOR((cos + 1.0) * 10.0), 0),
                                19) AS BIGINT) AS bucket FROM c)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs
        FROM h GROUP BY 1"""

    # open-order backlog ledger: declarative window cumsum mirror of the
    # engine's one-task ordered integer fold
    q["orders_backlog"] = """
        WITH opens AS (SELECT date_trunc('day', o_orderdate) AS day,
                              CAST(count(*) AS BIGINT) AS n_opened
                       FROM orders GROUP BY 1),
        cl AS (SELECT date_trunc('day', max(l_shipdate)) AS day
               FROM lineitem GROUP BY l_orderkey),
        closes AS (SELECT day, CAST(count(*) AS BIGINT) AS n_closed
                   FROM cl GROUP BY 1),
        u AS (SELECT COALESCE(o.day, c.day) AS day,
                     COALESCE(n_opened, 0) AS n_opened,
                     COALESCE(n_closed, 0) AS n_closed
              FROM opens o FULL OUTER JOIN closes c ON o.day = c.day)
        SELECT day, CAST(n_opened AS BIGINT) AS n_opened,
               CAST(n_closed AS BIGINT) AS n_closed,
               CAST(sum(n_opened - n_closed) OVER (ORDER BY day)
                    AS BIGINT) AS backlog
        FROM u"""

    # co-engagement Jaccard between event types over user sets
    q["event_type_affinity"] = f"""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM ut GROUP BY 1),
        p AS (SELECT x.event_type AS a, y.event_type AS b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM ut x JOIN ut y ON x.user_id = y.user_id
                                 AND x.event_type < y.event_type
              GROUP BY 1, 2)
        SELECT p.a, p.b, p.n_ab,
               {sql_round('CAST(p.n_ab AS DOUBLE) '
                          '/ CAST(na.n + nb.n - p.n_ab AS DOUBLE)', 6)}
                   AS jac6
        FROM p JOIN n na ON na.event_type = p.a
               JOIN n nb ON nb.event_type = p.b"""

    # Pearson quantity-price correlation per flag: HUGEINT exact moments
    # (the engine accumulates python ints), identical cast-then-multiply
    # float sequence both sides
    q["price_qty_corr"] = f"""
        WITH l AS (SELECT l_returnflag AS flag,
                          CAST(l_quantity AS BIGINT) AS q,
                          CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                              AS c
                   FROM lineitem),
        s AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(q) AS BIGINT) AS sq,
                     CAST(sum(c) AS BIGINT) AS sp,
                     sum(CAST(q AS HUGEINT) * q) AS sqq,
                     sum(CAST(c AS HUGEINT) * c) AS spp,
                     sum(CAST(q AS HUGEINT) * c) AS sqp
              FROM l GROUP BY 1),
        k AS (SELECT flag, n, sq, sp,
                     CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) AS num,
                     sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                            - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                         AS den
              FROM s)
        SELECT flag AS l_returnflag, n, sq AS sum_qty, sp AS sum_cents,
               CASE WHEN den > 0.0 THEN {sql_round('num / den', 6)}
                    ELSE 0.0 END AS corr6
        FROM k"""

    # phash per-bit balance: arithmetic >> on BIGINT preserves low bits
    # of the two's-complement word, so it matches the engine's uint64 view
    q["phash_bit_balance"] = f"""
        WITH b AS (SELECT u.i AS bit,
                          (phash >> u.i) & 1 AS v
                   FROM {images}, unnest(range(0, 64)) AS u(i))
        SELECT CAST(bit AS BIGINT) AS bit,
               CAST(sum(v) AS BIGINT) AS n_ones,
               CAST(count(*) AS BIGINT) AS n_rows,
               {sql_round('CAST(sum(v) AS DOUBLE) '
                          '/ CAST(count(*) AS DOUBLE)', 6)} AS share6
        FROM b GROUP BY 1"""

    # Heaps'-law growth curve: min-owner distinct fold (doc_novelty's
    # convention), cross-join checkpoint sums — all integers
    q["vocab_growth"] = f"""
        WITH toks AS (SELECT doc_id, unnest({split_toks}) AS w
                      FROM documents),
        td AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
               FROM toks GROUP BY 1),
        own AS (SELECT w, min(doc_id) AS own FROM toks GROUP BY 1),
        cp AS (SELECT unnest([16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072, 262144, 524288, 1048576]) AS c),
        tt AS (SELECT cp.c,
                      CAST(COALESCE(sum(CASE WHEN td.doc_id < cp.c
                                             THEN td.nt END), 0)
                           AS BIGINT) AS n_tokens
               FROM cp CROSS JOIN td GROUP BY 1),
        dv AS (SELECT cp.c,
                      CAST(COALESCE(sum(CASE WHEN own.own < cp.c
                                             THEN 1 END), 0)
                           AS BIGINT) AS n_distinct
               FROM cp CROSS JOIN own GROUP BY 1)
        SELECT CAST(tt.c AS BIGINT) AS checkpoint, tt.n_tokens,
               dv.n_distinct
        FROM tt JOIN dv ON dv.c = tt.c"""

    # per-changeset census across the three element classes
    q["osm_changeset_stats"] = f"""
        WITH u AS (SELECT changeset, uid, 'node' AS cls FROM {nodes}
                   UNION ALL
                   SELECT changeset, uid, 'way' FROM {ways}
                   UNION ALL
                   SELECT changeset, uid, 'relation' FROM {rels})
        SELECT changeset,
               CAST(sum(CASE WHEN cls = 'node' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nodes,
               CAST(sum(CASE WHEN cls = 'way' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ways,
               CAST(sum(CASE WHEN cls = 'relation' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_relations,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(DISTINCT uid) AS BIGINT) AS n_users
        FROM u GROUP BY 1"""

    # per-cell aspect-ratio mix of the image corpus (geo x image fusion)
    q["cell_aspect_mix"] = f"""
        WITH {_pts_cte(images)},
        wh AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell, w, h
               FROM pts JOIN (SELECT image_id, w, h FROM {images}) i
                 USING (image_id))
        SELECT cell, CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(CASE WHEN h > w THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_portrait,
               CAST(sum(CASE WHEN w > h THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_landscape,
               CAST(sum(CASE WHEN w = h THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_square,
               {sql_round('CAST(sum(CASE WHEN w > h THEN 1 ELSE 0 END) '
                          'AS DOUBLE) / CAST(count(*) AS DOUBLE)', 6)}
                   AS landscape6
        FROM wh GROUP BY 1"""

    # way-graph degree histogram (isolated ways at degree 0)
    q["way_degree_hist"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b
                 ON a.ref = b.ref AND a.way_id < b.way_id),
        ed2 AS (SELECT a AS u FROM ed UNION ALL SELECT b FROM ed),
        dd AS (SELECT u AS v, CAST(count(*) AS BIGINT) AS n
               FROM ed2 GROUP BY 1),
        deg AS (SELECT w.id AS v, CAST(COALESCE(dd.n, 0) AS BIGINT) AS d
                FROM {ways} w LEFT JOIN dd ON dd.v = w.id),
        h AS (SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_ways
              FROM deg GROUP BY 1),
        tot AS (SELECT CAST(sum(n_ways) AS BIGINT) AS t FROM h)
        SELECT CAST(degree AS BIGINT) AS degree, n_ways,
               {sql_round('CAST(n_ways AS DOUBLE) / CAST(tot.t AS DOUBLE)',
                          6)} AS share6
        FROM h, tot"""

    # token-length histogram (pre-tokenizer fertility probe)
    q["doc_token_len_hist"] = f"""
        WITH toks AS (SELECT unnest({split_toks}) AS w FROM documents),
        h AS (SELECT CAST(length(w) AS BIGINT) AS token_len,
                     CAST(count(*) AS BIGINT) AS n_tokens
              FROM toks GROUP BY 1),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM h)
        SELECT token_len, n_tokens,
               {sql_round('CAST(n_tokens AS DOUBLE) '
                          '/ CAST(tot.t AS DOUBLE)', 6)} AS share6
        FROM h, tot"""

    # time-to-convert histogram over first-view -> first-purchase lags
    q["funnel_latency_hist"] = f"""
        WITH f1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        f2 AS (SELECT user_id, min(ts) AS t2 FROM events
               WHERE event_type = 'purchase' GROUP BY 1),
        l AS (SELECT (epoch_us(t2) - epoch_us(t1)) // 86400000000
                  AS lag_days
              FROM f1 JOIN f2 USING (user_id) WHERE t2 > t1),
        h AS (SELECT lag_days, CAST(count(*) AS BIGINT) AS n_users
              FROM l GROUP BY 1),
        tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM h)
        SELECT CAST(lag_days AS BIGINT) AS lag_days, n_users,
               {sql_round('CAST(n_users AS DOUBLE) '
                          '/ CAST(tot.t AS DOUBLE)', 6)} AS share6
        FROM h, tot"""

    # referential-integrity audit (dangling way refs / relation members)
    q["osm_ref_integrity"] = f"""
        WITH wr AS (SELECT 'way->node' AS kind, unnest(refs) AS id
                    FROM {ways}),
        rn AS (SELECT 'rel->node' AS kind, _m.ref AS id
               FROM (SELECT unnest(members) AS _m FROM {rels})
               WHERE _m.type = 'node'),
        rw AS (SELECT 'rel->way' AS kind, _m.ref AS id
               FROM (SELECT unnest(members) AS _m FROM {rels})
               WHERE _m.type = 'way'),
        refs AS (SELECT * FROM wr UNION ALL SELECT * FROM rn
                 UNION ALL SELECT * FROM rw),
        defs AS (SELECT 'way->node' AS kind, id FROM {nodes}
                 UNION ALL SELECT 'rel->node', id FROM {nodes}
                 UNION ALL SELECT 'rel->way', id FROM {ways})
        SELECT refs.kind AS ref_kind,
               CAST(count(*) AS BIGINT) AS n_refs,
               CAST(count(DISTINCT refs.id) AS BIGINT) AS n_distinct,
               CAST(sum(CASE WHEN defs.id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dangling
        FROM refs LEFT JOIN defs
          ON defs.kind = refs.kind AND defs.id = refs.id
        GROUP BY 1"""

    # 1-NN reciprocity over the integer-lattice capped sample
    q["knn_mutuality"] = f"""
        WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                          unnest(range(1, len(embedding) + 1)) AS i
                   FROM embeddings WHERE vec_id < {ANGULAR_CAP}),
        qv AS (SELECT vec_id, i,
                      CAST({sql_round('CAST(x AS DOUBLE) * 512.0', 0)}
                           AS BIGINT) AS q
               FROM e),
        d AS (SELECT a.vec_id AS a, b.vec_id AS b,
                     CAST(sum(a.q * b.q) AS BIGINT) AS dot
              FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id <> b.vec_id
              GROUP BY 1, 2),
        nrm AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n
                FROM qv GROUP BY 1),
        c AS (SELECT d.a, d.b, CAST(d.dot AS DOUBLE)
                     / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS cos
              FROM d JOIN nrm na ON na.vec_id = d.a
                     JOIN nrm nb ON nb.vec_id = d.b),
        r AS (SELECT a AS vec_id, b AS nn_id, row_number() OVER (
                  PARTITION BY a ORDER BY cos DESC, b ASC) AS rk
              FROM c),
        nn AS (SELECT vec_id, nn_id FROM r WHERE rk = 1)
        SELECT x.vec_id, x.nn_id, (y.nn_id = x.vec_id) AS mutual
        FROM nn x JOIN nn y ON y.vec_id = x.nn_id"""

    # per-user consecutive-run census: the gaps-and-islands mirror
    q["events_runlength"] = """
        WITH e AS (SELECT user_id, event_type,
                          row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
                          row_number() OVER (PARTITION BY user_id,
                              event_type ORDER BY ts, event_id) AS rt
                   FROM events),
        runs AS (SELECT user_id, event_type, rn - rt AS grp,
                        CAST(count(*) AS BIGINT) AS run_len
                 FROM e GROUP BY 1, 2, 3)
        SELECT event_type, run_len,
               CAST(count(*) AS BIGINT) AS n_runs
        FROM runs GROUP BY 1, 2"""

    # bytes-per-pixel compression profile per encoding (metadata-only)
    q["format_bpp_stats"] = f"""
        WITH b AS (SELECT fmt,
                          CAST(octet_length(bytes) AS BIGINT) AS bl,
                          CAST(w AS BIGINT) * h AS px
                   FROM {images})
        SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(bl) AS BIGINT) AS total_bytes,
               CAST(sum(px) AS BIGINT) AS total_px,
               {sql_round('CAST(sum(bl) AS DOUBLE) '
                          '/ CAST(sum(px) AS DOUBLE)', 6)} AS bpp6,
               {sql_round('min(CAST(bl AS DOUBLE) / CAST(px AS DOUBLE))',
                          6)} AS min_bpp6,
               {sql_round('max(CAST(bl AS DOUBLE) / CAST(px AS DOUBLE))',
                          6)} AS max_bpp6
        FROM b GROUP BY 1"""

    # tag value-vocabulary audit per key (top value ties lexically)
    q["tag_value_cardinality"] = f"""
        WITH kv AS (SELECT _t.key AS key, _t.value AS value
                    FROM (SELECT unnest(tags) AS _t FROM {ways})),
        c AS (SELECT key, value, CAST(count(*) AS BIGINT) AS n
              FROM kv GROUP BY 1, 2),
        r AS (SELECT key, value, n, row_number() OVER (
                  PARTITION BY key ORDER BY n DESC, value ASC) AS rk
              FROM c),
        agg AS (SELECT key, CAST(sum(n) AS BIGINT) AS n_uses,
                       CAST(count(*) AS BIGINT) AS n_values
                FROM c GROUP BY 1)
        SELECT agg.key, agg.n_uses, agg.n_values,
               r.value AS top_value, r.n AS top_n
        FROM agg JOIN r ON r.key = agg.key AND r.rk = 1"""

    # per-cell way-vertex vs POI node split (cross-layer semi-join)
    q["cell_node_usage"] = f"""
        WITH refs AS (SELECT DISTINCT unnest(refs) AS id FROM {ways}),
        n AS (SELECT {tiles.sql_cell_id('lon', 'lat', ENTROPY_RES)} AS cell,
                     (refs.id IS NOT NULL) AS used
              FROM {nodes} nd LEFT JOIN refs ON refs.id = nd.id)
        SELECT cell, CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(CASE WHEN used THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_way_nodes,
               {sql_round('CAST(sum(CASE WHEN used THEN 1 ELSE 0 END) '
                          'AS DOUBLE) / CAST(count(*) AS DOUBLE)', 6)}
                   AS share6
        FROM n GROUP BY 1"""

    # per-supplier order-to-ship latency (big x big orderkey join)
    q["supplier_ship_lag"] = f"""
        WITH j AS (SELECT l.l_suppkey,
                          datediff('day',
                                   date_trunc('day', o.o_orderdate),
                                   date_trunc('day', l.l_shipdate))
                              AS lag
                   FROM lineitem l JOIN orders o
                     ON o.o_orderkey = l.l_orderkey)
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(lag) AS BIGINT) AS total_lag_days,
               {sql_round('CAST(sum(lag) AS DOUBLE) '
                          '/ CAST(count(*) AS DOUBLE)', 6)} AS mean_lag6
        FROM j GROUP BY 1"""

    # bot-net screen: users co-active in the same minute buckets
    q["user_sync_pairs"] = f"""
        WITH ut AS (SELECT DISTINCT date_trunc('minute', ts) AS ts,
                           user_id
                    FROM events),
        p AS (SELECT x.user_id AS a, y.user_id AS b,
                     CAST(count(*) AS BIGINT) AS n_shared
              FROM ut x JOIN ut y
                ON x.ts = y.ts AND x.user_id < y.user_id
              GROUP BY 1, 2)
        SELECT a, b, n_shared FROM p WHERE n_shared >= 1"""

    # per-label cohesion via the n-cancellation centroid trick:
    # integer-lattice sums S, cos(x, S) exact-int dot/norms, member
    # cosines land on the 1e-9 grid before the integer mean
    q["label_cohesion"] = f"""
        WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                          unnest(embedding) AS x,
                          unnest(range(1, len(embedding) + 1)) AS i
                   FROM embeddings),
        qv AS (SELECT vec_id, label, i,
                      CAST({sql_round('CAST(x AS DOUBLE) * 512.0', 0)}
                           AS BIGINT) AS q
               FROM e),
        s AS (SELECT label, i, CAST(sum(q) AS BIGINT) AS sv
              FROM qv GROUP BY 1, 2),
        dots AS (SELECT qv.vec_id, qv.label,
                        CAST(sum(qv.q * s.sv) AS BIGINT) AS dot,
                        CAST(sum(qv.q * qv.q) AS BIGINT) AS nx
                 FROM qv JOIN s ON s.label = qv.label AND s.i = qv.i
                 GROUP BY 1, 2),
        ns AS (SELECT label, CAST(sum(sv * sv) AS BIGINT) AS nsum
               FROM s GROUP BY 1),
        c AS (SELECT d.label,
                     CAST(d.dot AS DOUBLE)
                     / sqrt(CAST(d.nx AS DOUBLE) * CAST(ns.nsum AS DOUBLE))
                         AS cos
              FROM dots d JOIN ns ON ns.label = d.label),
        g AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST({sql_round('cos * 1000000000.0', 0)}
                                   AS BIGINT)) AS BIGINT) AS q9,
                     min({sql_round('cos', 6)}) AS mn
              FROM c GROUP BY 1)
        SELECT label, n,
               {sql_round('CAST(q9 AS DOUBLE) '
                          '/ (CAST(n AS DOUBLE) * 1000000000.0)', 6)}
                   AS mean_cos6,
               mn AS min_cos6
        FROM g"""

    # cross-modal referential audit: caption's first number vs id suffix
    q["caption_id_consistency"] = f"""
        WITH c AS (SELECT CAST(substr(image_id, 4) AS BIGINT) AS idn,
                          CAST(regexp_extract(caption, '[0-9]+')
                               AS BIGINT) AS capn
                   FROM {images}),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN idn = capn THEN 1 ELSE 0 END)
                          AS BIGINT) AS nm
              FROM c)
        SELECT n AS n_images, nm AS n_match, n - nm AS n_mismatch,
               {sql_round('CAST(nm AS DOUBLE) / CAST(n AS DOUBLE)', 6)}
                   AS match6
        FROM s"""

    # one Chaikin corner-cut iteration: dyadic 0.75/0.25 weights are
    # the same IEEE sequence both sides; completeness filter mirrored
    q["way_chaikin_smooth"] = f"""
        WITH exp AS (SELECT id AS way_id, u.i - 1 AS pos, refs[u.i] AS ref,
                            len(refs) AS n
                     FROM {ways}, unnest(range(1, len(refs) + 1)) AS u(i)),
        pt AS (SELECT e.way_id, e.pos, e.n, nd.lon, nd.lat
               FROM exp e JOIN {nodes} nd ON nd.id = e.ref),
        okw AS (SELECT way_id FROM pt GROUP BY way_id
                HAVING count(*) = max(n)),
        seg AS (SELECT pt.way_id, pos, n, lon, lat,
                       lead(lon) OVER w AS lon2, lead(lat) OVER w AS lat2
                FROM pt JOIN okw USING (way_id)
                WINDOW w AS (PARTITION BY pt.way_id ORDER BY pos)),
        outp AS (
          SELECT way_id, CAST(0 AS BIGINT) AS pt_idx,
                 {sql_round('lon', 7)} AS lon7,
                 {sql_round('lat', 7)} AS lat7
          FROM seg WHERE pos = 0
          UNION ALL
          SELECT way_id, CAST(2 * pos + 1 AS BIGINT),
                 {sql_round('0.75 * lon + 0.25 * lon2', 7)},
                 {sql_round('0.75 * lat + 0.25 * lat2', 7)}
          FROM seg WHERE lon2 IS NOT NULL
          UNION ALL
          SELECT way_id, CAST(2 * pos + 2 AS BIGINT),
                 {sql_round('0.25 * lon + 0.75 * lon2', 7)},
                 {sql_round('0.25 * lat + 0.75 * lat2', 7)}
          FROM seg WHERE lon2 IS NOT NULL
          UNION ALL
          SELECT way_id, CAST(2 * (n - 1) + 1 AS BIGINT),
                 {sql_round('lon', 7)}, {sql_round('lat', 7)}
          FROM seg WHERE pos = n - 1 AND n >= 2)
        SELECT * FROM outp"""

    # dead-end census: endpoint nodes referenced by exactly one way
    q["way_dead_ends"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        deg AS (SELECT ref, CAST(count(DISTINCT way_id) AS BIGINT) AS d
                FROM exp GROUP BY 1),
        ep AS (SELECT id AS way_id, refs[1] AS ref FROM {ways}
               WHERE len(refs) >= 1
               UNION
               SELECT id, refs[len(refs)] FROM {ways}
               WHERE len(refs) >= 1)
        SELECT ep.way_id, CAST(count(*) AS BIGINT) AS n_endpoints,
               CAST(sum(CASE WHEN deg.d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dead
        FROM ep JOIN deg ON deg.ref = ep.ref GROUP BY 1"""

    # cross-corpus vocabulary overlap (docs vs captions, same tokenizer)
    q["corpus_vocab_overlap"] = f"""
        WITH dv AS (SELECT DISTINCT unnest({split_toks}) AS w
                    FROM documents),
        cv AS (SELECT DISTINCT unnest(
                   list_filter(string_split(lower(caption), ' '),
                               _w -> _w <> '')) AS w
               FROM {images}),
        s AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM dv) AS nd,
                     (SELECT CAST(count(*) AS BIGINT) FROM cv) AS nc,
                     (SELECT CAST(count(*) AS BIGINT)
                      FROM dv JOIN cv USING (w)) AS ns)
        SELECT nd AS n_doc_vocab, nc AS n_cap_vocab, ns AS n_shared,
               {sql_round('CAST(ns AS DOUBLE) '
                          '/ CAST(nd + nc - ns AS DOUBLE)', 6)} AS jac6
        FROM s"""

    # way-length Gini over exact integer millimetres (HUGEINT Lorenz)
    q["way_length_gini"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq,
                            len(refs) AS np
                     FROM {ways} WHERE len(refs) >= 2),
        pts AS (SELECT e.way_id, e.seq, e.np, n.lon AS x, n.lat AS y
                FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, np, x, y,
                       lead(x) OVER w AS x2, lead(y) OVER w AS y2
                FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        agg AS (SELECT way_id, max(np) AS np, count(*) AS resolved,
                       sum(CASE WHEN x2 IS NULL THEN 0.0
                                ELSE 2.0 * {EARTH_R_M!r}
                                     * ASIN(SQRT({_hava})) END) AS ln
                FROM seg GROUP BY way_id),
        L AS (SELECT {sql_round('ln', 3)} AS len_m3 FROM agg
              WHERE resolved = np),
        v AS (SELECT CAST(ROUND(len_m3 * 1000) AS BIGINT) AS x FROM L),
        r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM v),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS tot,
                     sum(CAST(i AS HUGEINT) * x) AS s2
              FROM r)
        SELECT n AS n_ways, tot AS total_mm,
               CASE WHEN n = 0 OR tot = 0 THEN 0.0 ELSE
                 {sql_round('CAST(2 * s2 - (n + 1) * tot AS DOUBLE) '
                            '/ CAST(CAST(n AS HUGEINT) * tot AS DOUBLE)',
                            6)}
               END AS gini6
        FROM s"""

    # weekly type-mix JS drift vs the global mix (ordered-term fold)
    q["weekly_mix_drift"] = f"""
        WITH e AS (SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT)
                       AS week, event_type
                   FROM events),
        cw AS (SELECT week, event_type, CAST(count(*) AS BIGINT) AS c
               FROM e GROUP BY 1, 2),
        tw AS (SELECT week, CAST(sum(c) AS BIGINT) AS w FROM cw
               GROUP BY 1),
        g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS gcnt
              FROM e GROUP BY 1),
        tg AS (SELECT CAST(count(*) AS BIGINT) AS gt FROM e),
        j AS (SELECT tw.week, g.event_type, tw.w, tg.gt, g.gcnt,
                     COALESCE(cw.c, 0) AS c
              FROM tw CROSS JOIN g
              LEFT JOIN cw ON cw.week = tw.week
                          AND cw.event_type = g.event_type, tg),
        terms AS (SELECT week, event_type, w,
                         CAST(c AS DOUBLE) / CAST(w AS DOUBLE) AS p,
                         CAST(gcnt AS DOUBLE) / CAST(gt AS DOUBLE) AS q
                  FROM j),
        t2 AS (SELECT week, event_type, w,
                      (CASE WHEN p > 0.0 THEN
                           0.5 * (p * ln(p / (0.5 * (p + q))))
                       ELSE 0.0 END)
                      + (CASE WHEN q > 0.0 THEN
                           0.5 * (q * ln(q / (0.5 * (p + q))))
                         ELSE 0.0 END) AS term
               FROM terms),
        f AS (SELECT week, max(w) AS n_events,
                     sum(term ORDER BY event_type) AS js
              FROM t2 GROUP BY week)
        SELECT week, n_events, {sql_round('js', 6)} AS js6 FROM f"""

    # order/line status-model contingency with violation flags
    q["order_status_consistency"] = """
        SELECT o.o_orderstatus, l.l_linestatus,
               CAST(count(*) AS BIGINT) AS n_lines,
               ((o.o_orderstatus = 'F' AND l.l_linestatus <> 'F')
                OR (o.o_orderstatus = 'O' AND l.l_linestatus <> 'O'))
                   AS violation
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2"""

    # event_id-vs-ts ordering audit: per-user inversion pairs
    q["events_id_ts_inversions"] = f"""
        WITH p AS (SELECT a.user_id,
                          CAST(count(*) AS BIGINT) AS pairs,
                          CAST(sum(CASE WHEN a.ts > b.ts THEN 1 ELSE 0
                                   END) AS BIGINT) AS inv
                   FROM events a JOIN events b
                     ON a.user_id = b.user_id
                    AND a.event_id < b.event_id
                   GROUP BY 1),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(pairs) AS BIGINT) AS total_pairs,
                     CAST(sum(inv) AS BIGINT) AS n_inversions
              FROM p)
        SELECT n_users, total_pairs, n_inversions,
               {sql_round('CAST(n_inversions AS DOUBLE) '
                          '/ CAST(total_pairs AS DOUBLE)', 6)} AS inv6
        FROM s"""

    # distinct quadtree cells per way (spatial-locality census)
    q["way_cell_span"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        pt AS (SELECT e.way_id,
                      {tiles.sql_cell_id('n.lon', 'n.lat', 11)} AS cell
               FROM exp e JOIN {nodes} n ON n.id = e.ref)
        SELECT way_id, CAST(count(*) AS BIGINT) AS n_points,
               CAST(count(DISTINCT cell) AS BIGINT) AS n_cells
        FROM pt GROUP BY 1"""

    # tags-per-node histogram (annotation-density profile)
    q["node_tag_hist"] = f"""
        WITH h AS (SELECT CAST(len(tags) AS BIGINT) AS n_tags,
                          CAST(count(*) AS BIGINT) AS n_nodes
                   FROM {nodes} GROUP BY 1),
        tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS t FROM h)
        SELECT n_tags, n_nodes,
               {sql_round('CAST(n_nodes AS DOUBLE) '
                          '/ CAST(tot.t AS DOUBLE)', 6)} AS share6
        FROM h, tot"""

    # exact log2 histogram of lattice squared-norms (bit_length buckets)
    q["embed_norm_hist"] = f"""
        WITH qv AS (SELECT vec_id,
                           CAST({sql_round('CAST(x AS DOUBLE) * 512.0', 0)}
                                AS BIGINT) AS q
                    FROM (SELECT vec_id, unnest(embedding) AS x
                          FROM embeddings)),
        n2 AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
               FROM qv GROUP BY 1),
        b AS (SELECT CASE WHEN n2 = 0 THEN CAST(0 AS BIGINT)
                          ELSE CAST(length(bin(n2)) AS BIGINT) END
                   AS bucket
              FROM n2),
        h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs
              FROM b GROUP BY 1),
        tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t FROM h)
        SELECT bucket, n_vecs,
               {sql_round('CAST(n_vecs AS DOUBLE) '
                          '/ CAST(tot.t AS DOUBLE)', 6)} AS share6
        FROM h, tot"""

    # image density per OSM node per cell (cross-layer coverage)
    q["cell_image_node_ratio"] = f"""
        WITH {_pts_cte(images)},
        ic AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                      CAST(count(*) AS BIGINT) AS i
               FROM pts GROUP BY 1),
        nc AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                      CAST(count(*) AS BIGINT) AS n
               FROM {nodes} GROUP BY 1)
        SELECT COALESCE(ic.cell, nc.cell) AS cell,
               CAST(COALESCE(ic.i, 0) AS BIGINT) AS n_images,
               CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_nodes,
               CASE WHEN COALESCE(nc.n, 0) > 0 THEN
                 {sql_round('CAST(COALESCE(ic.i, 0) AS DOUBLE) '
                            '/ CAST(nc.n AS DOUBLE)', 6)}
               ELSE 0.0 END AS ratio6
        FROM ic FULL OUTER JOIN nc ON nc.cell = ic.cell"""

    # tag presence vs graph connectivity crosstab
    q["tagged_way_connectivity"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b
                 ON a.ref = b.ref AND a.way_id < b.way_id),
        dd AS (SELECT v, CAST(count(*) AS BIGINT) AS d
               FROM (SELECT a AS v FROM ed UNION ALL SELECT b FROM ed)
               GROUP BY 1),
        w AS (SELECT id,
                     (len(list_filter(tags, _t -> _t.key = 'highway'))
                      > 0) AS tagged,
                     CAST(COALESCE(dd.d, 0) AS BIGINT) AS d
              FROM {ways} LEFT JOIN dd ON dd.v = id)
        SELECT tagged, CAST(count(*) AS BIGINT) AS n_ways,
               CAST(sum(d) AS BIGINT) AS total_deg,
               CASE WHEN count(*) > 0 THEN
                 {sql_round('CAST(sum(d) AS DOUBLE) '
                            '/ CAST(count(*) AS DOUBLE)', 6)}
               ELSE 0.0 END AS mean_deg6
        FROM w GROUP BY 1"""

    # bounce rate by entry type: window-cumsum session ids (the classic
    # gaps-and-islands over time), firsts + lengths per session
    q["session_bounce_rate"] = f"""
        WITH e AS (SELECT user_id, ts, event_id, event_type,
                          CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                  > 1800000000
                               THEN 1 ELSE 0 END AS brk
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        s AS (SELECT user_id, ts, event_id, event_type,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS sess
              FROM e),
        per AS (SELECT user_id, sess, CAST(count(*) AS BIGINT) AS len
                FROM s GROUP BY 1, 2),
        fs AS (SELECT user_id, sess, event_type,
                      row_number() OVER (PARTITION BY user_id, sess
                                         ORDER BY ts, event_id) AS rk
               FROM s),
        g AS (SELECT fs.event_type AS first_type,
                     CAST(count(*) AS BIGINT) AS n_sessions,
                     CAST(sum(CASE WHEN per.len = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_bounce
              FROM per JOIN fs ON fs.user_id = per.user_id
                              AND fs.sess = per.sess AND fs.rk = 1
              GROUP BY 1)
        SELECT first_type, n_sessions, n_bounce,
               {sql_round('CAST(n_bounce AS DOUBLE) '
                          '/ CAST(n_sessions AS DOUBLE)', 6)} AS bounce6
        FROM g"""

    # chars-vs-tokens Pearson per language (exact HUGEINT moments)
    q["doc_len_token_corr"] = f"""
        WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS c,
                          CAST(len({split_toks}) AS BIGINT) AS k
                   FROM documents),
        s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(c) AS BIGINT) AS sc,
                     CAST(sum(k) AS BIGINT) AS st,
                     sum(CAST(c AS HUGEINT) * c) AS scc,
                     sum(CAST(k AS HUGEINT) * k) AS stt,
                     sum(CAST(c AS HUGEINT) * k) AS sct
              FROM d GROUP BY 1),
        kk AS (SELECT lang, n, sc, st,
                      CAST(n AS DOUBLE) * CAST(sct AS DOUBLE)
                      - CAST(sc AS DOUBLE) * CAST(st AS DOUBLE) AS num,
                      sqrt(CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
                           - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                             - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                          AS den
               FROM s)
        SELECT lang, n, sc AS sum_chars, st AS sum_tokens,
               CASE WHEN den > 0.0 THEN {sql_round('num / den', 6)}
                    ELSE 0.0 END AS corr6
        FROM kk"""

    # per-doc type-token ratio (lexical richness)
    q["doc_ttr"] = f"""
        WITH toks AS (SELECT doc_id, unnest({split_toks}) AS w
                      FROM documents)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT w) AS BIGINT) AS n_types,
               {sql_round('CAST(count(DISTINCT w) AS DOUBLE) '
                          '/ CAST(count(*) AS DOUBLE)', 6)} AS ttr6
        FROM toks GROUP BY 1"""

    # entry-to-exit journey matrix (first/last event type per user)
    q["user_journey_endpoints"] = """
        WITH r AS (SELECT user_id, event_type,
                          row_number() OVER w AS rk,
                          count(*) OVER (PARTITION BY user_id) AS n
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        fl AS (SELECT f.user_id, f.event_type AS first_type,
                      l.event_type AS last_type
               FROM r f JOIN r l ON l.user_id = f.user_id
                               AND f.rk = 1 AND l.rk = l.n)
        SELECT first_type, last_type,
               CAST(count(*) AS BIGINT) AS n_users
        FROM fl GROUP BY 1, 2"""

    # component-size histogram on the way_components recursive oracle
    q["component_size_hist"] = f"""
        WITH RECURSIVE exp AS (
          SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id <> b.way_id),
        reach(way_id, lbl) AS (
          SELECT id, id FROM {ways}
          UNION
          SELECT e.b, r.lbl FROM reach r JOIN ed e ON e.a = r.way_id),
        comp AS (SELECT way_id, min(lbl) AS c FROM reach GROUP BY 1),
        sz AS (SELECT c, CAST(count(*) AS BIGINT) AS size
               FROM comp GROUP BY 1),
        h AS (SELECT size, CAST(count(*) AS BIGINT) AS n_components
              FROM sz GROUP BY 1),
        tot AS (SELECT CAST(sum(n_components) AS BIGINT) AS t FROM h)
        SELECT size, n_components,
               {sql_round('CAST(n_components AS DOUBLE) '
                          '/ CAST(tot.t AS DOUBLE)', 6)} AS share6
        FROM h, tot"""

    # exact-duplicate census on the integer lattice (list group-by)
    q["embed_exact_dupes"] = f"""
        WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                          unnest(range(1, len(embedding) + 1)) AS i
                   FROM embeddings),
        qv AS (SELECT vec_id,
                      list(CAST({sql_round('CAST(x AS DOUBLE) * 512.0', 0)}
                                AS BIGINT) ORDER BY i) AS q
               FROM e GROUP BY vec_id),
        g AS (SELECT q, CAST(count(*) AS BIGINT) AS c
              FROM qv GROUP BY q)
        SELECT CAST(sum(c) AS BIGINT) AS n_vecs,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(c) - count(*) AS BIGINT) AS n_dupes,
               CAST(max(c) AS BIGINT) AS max_group
        FROM g"""

    # per-user error-share decile histogram (exact integer deciles)
    q["user_error_profile"] = f"""
        WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(CASE WHEN event_type = 'error'
                                        THEN 1 ELSE 0 END) AS BIGINT)
                              AS e
                   FROM events GROUP BY 1),
        d AS (SELECT LEAST((10 * e) // GREATEST(n, 1), 9) AS decile
              FROM u),
        h AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users
              FROM d GROUP BY 1),
        tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM h)
        SELECT CAST(decile AS BIGINT) AS decile, n_users,
               {sql_round('CAST(n_users AS DOUBLE) '
                          '/ CAST(tot.t AS DOUBLE)', 6)} AS share6
        FROM h, tot"""

    # ---- python-oracle parquet gates (non-SQL-expressible ops) -----------
    # pyoracle.py computes these by a deliberately different plan (scalar
    # per-row loops / O(n^2) brute force); the SQL just reads the file.
    from . import pyoracle
    exp = pyoracle.ensure_expected(sf)
    q["hilbert_order"] = f"SELECT image_id, hilbert16, shard FROM read_parquet('{exp['hilbert_order']}')"
    q["detect_nms"] = f"SELECT image_id, n_kept, keep_mask FROM read_parquet('{exp['detect_nms']}')"
    q["way_frechet"] = f"SELECT a, b, frechet3 FROM read_parquet('{exp['way_frechet']}')"
    q["way_conflate"] = q["way_conflate"].replace(
        "__EXP_WAY_FRECHET__", exp["way_conflate_pairs"])
    q["way_rasterize"] = f"SELECT tile_x, tile_y, n_px, visits FROM read_parquet('{exp['way_rasterize']}')"
    q["mmr_select"] = f"SELECT query_id, rank, vec_id, mmr6 FROM read_parquet('{exp['mmr_select']}')"
    q["way_pseudo_diameter"] = f"SELECT component, n_ways, diameter FROM read_parquet('{exp['way_pseudo_diameter']}')"
    q["cell_image_mosaic"] = f"SELECT cell, n_imgs, mean6, crc FROM read_parquet('{exp['cell_image_mosaic']}')"
    q["image_transcode"] = f"SELECT image_id, fmt, in_bytes, out_bytes, psnr6 FROM read_parquet('{exp['image_transcode']}')"
    q["image_sharpness"] = f"SELECT image_id, ok, n_px, lap_var6 FROM read_parquet('{exp['image_sharpness']}')"
    q["image_palette"] = f"SELECT image_id, ok, top_bucket, top_share6, n_colors FROM read_parquet('{exp['image_palette']}')"
    q["image_ssim"] = f"SELECT image_id, fmt, ssim6 FROM read_parquet('{exp['image_ssim']}')"
    q["image_border_contrast"] = f"SELECT image_id, ok, border_mean6, ratio6 FROM read_parquet('{exp['image_border_contrast']}')"
    q["way_resample"] = f"SELECT way_id, pt_idx, lon6, lat6 FROM read_parquet('{exp['way_resample']}')"
    q["image_orientation"] = f"SELECT image_id, ok, n_grad, dom_oct, dom_share6 FROM read_parquet('{exp['image_orientation']}')"
    q["raster_viewshed"] = f"SELECT tile_x, tile_y, px, py, n, visible FROM read_parquet('{exp['raster_viewshed']}')"
    q["image_flip_asym"] = f"SELECT image_id, ok, n_px, asym6, max_d FROM read_parquet('{exp['image_flip_asym']}')"
    q["image_crop_retention"] = f"SELECT image_id, ok, crop_side, ret6 FROM read_parquet('{exp['image_crop_retention']}')"
    q["cell_luma_morans"] = f"SELECT n_cells, w_pairs, morans_i6 FROM read_parquet('{exp['cell_luma_morans']}')"
    q["image_blob_count"] = f"SELECT image_id, ok, n_px, n_fg, n_blobs, max_blob FROM read_parquet('{exp['image_blob_count']}')"
    q["image_rle_ratio"] = f"SELECT image_id, ok, n_px, n_runs, rle6 FROM read_parquet('{exp['image_rle_ratio']}')"
    q["image_exposure_clip"] = f"SELECT image_id, ok, n_px, n_black, n_white, black6, white6 FROM read_parquet('{exp['image_exposure_clip']}')"
    q["image_channel_balance"] = f"SELECT image_id, ok, sum_r, sum_g, sum_b, share_r6, share_g6, share_b6, skew_channel FROM read_parquet('{exp['image_channel_balance']}')"
    q["image_noise_mad"] = f"SELECT image_id, ok, n_interior, mad_lap FROM read_parquet('{exp['image_noise_mad']}')"
    q["image_luma_percentiles"] = f"SELECT image_id, ok, p5, p50, p95, spread FROM read_parquet('{exp['image_luma_percentiles']}')"
    q["image_quadrant_luma"] = f"SELECT image_id, ok, sum_tl, sum_tr, sum_bl, sum_br, bright_quad, imbalance6 FROM read_parquet('{exp['image_quadrant_luma']}')"
    q["audio_silence_ratio"] = f"SELECT media_id, n_windows, n_silent, silence6 FROM read_parquet('{exp['audio_silence_ratio']}')"
    q["video_shot_cuts"] = f"SELECT media_id, n_cuts, max_d6 FROM read_parquet('{exp['video_shot_cuts']}')"
    q["image_colorfulness"] = f"SELECT image_id, ok, n_px, spread_sum, mean_spread6 FROM read_parquet('{exp['image_colorfulness']}')"
    q["cluster_cohesion"] = f"SELECT cluster, n, mean_cos6, min_cos6 FROM read_parquet('{exp['cluster_cohesion']}')"
    q["user_survival"] = f"SELECT day, n_risk, n_events, km6 FROM read_parquet('{exp['user_survival']}')"
    q["embed_hard_negatives"] = f"SELECT query_id, pos_id, neg_id, pos6, neg6, margin6 FROM read_parquet('{exp['embed_hard_negatives']}')"
    q["events_markov_stationary"] = f"SELECT event_type, pi6 FROM read_parquet('{exp['events_markov_stationary']}')"
    q["doc_compression_ratio"] = f"SELECT doc_id, raw_len, comp_len, ratio6 FROM read_parquet('{exp['doc_compression_ratio']}')"
    q["way_mst"] = f"SELECT component, n_ways, n_edges, total_w FROM read_parquet('{exp['way_mst']}')"
    q["minhash_pairs"] = f"SELECT a, b, jac6 FROM read_parquet('{exp['minhash_pairs']}')"
    q["simhash_pairs"] = f"SELECT a, b, hamming FROM read_parquet('{exp['simhash_pairs']}')"
    q["winnow_fp"] = f"SELECT doc_id, winnow_fp FROM read_parquet('{exp['winnow_fp']}')"
    q["images_s2"] = f"SELECT image_id, s2_l10, s2_l14 FROM read_parquet('{exp['images_s2']}')"
    q["ngram_jaccard_pairs"] = f"SELECT a, b, jac6 FROM read_parquet('{exp['ngram_jaccard_pairs']}')"
    q["neardup_keep"] = f"SELECT doc_id FROM read_parquet('{exp['neardup_keep']}')"
    q["approx_distinct_users"] = f"SELECT event_type, approx_n FROM read_parquet('{exp['approx_distinct_users']}')"
    q["ann_ivf_topk"] = f"SELECT query_id, rank, vec_id FROM read_parquet('{exp['ann_ivf_topk']}')"
    q["embed_kmeans"] = f"SELECT vec_id, cluster FROM read_parquet('{exp['embed_kmeans']}')"
    q["image_stats"] = f"SELECT image_id, ok, w_px, h_px, mean_px6 FROM read_parquet('{exp['image_stats']}')"
    q["flagship_decode"] = q["flagship_decode"].replace(
        "__EXP_IMAGE_STATS__", exp["image_stats"])
    q["image_verify"] = f"SELECT image_id, dims_ok, pixels_ok, caption_ok, psnr6 FROM read_parquet('{exp['image_verify']}')"
    q["image_ahash"] = f"SELECT image_id, ahash FROM read_parquet('{exp['image_ahash']}')"
    q["patch_extract"] = f"SELECT image_id, py, px, patch_mean6 FROM read_parquet('{exp['patch_extract']}')"
    q["image_sig_dedup"] = f"SELECT ahash, keeper_id, group_n FROM read_parquet('{exp['image_sig_dedup']}')"
    q["way_simplify"] = f"SELECT way_id, n_points, n_kept, kept_seq_sum FROM read_parquet('{exp['way_simplify']}')"
    q["way_pagerank"] = f"SELECT way_id, deg, pr9 FROM read_parquet('{exp['way_pagerank']}')"
    q["images_geohash"] = f"SELECT image_id, gh6, gh4 FROM read_parquet('{exp['images_geohash']}')"
    q["geohash_rollup"] = f"SELECT lvl, prefix, n FROM read_parquet('{exp['geohash_rollup']}')"
    q["images_hex"] = f"SELECT image_id, hq_f, hr_f, hq_c, hr_c FROM read_parquet('{exp['images_hex']}')"
    q["ann_pq_topk"] = f"SELECT query_id, rank, vec_id FROM read_parquet('{exp['ann_pq_topk']}')"
    q["semdedup"] = f"SELECT vec_id, cluster, maxcos6, kept FROM read_parquet('{exp['semdedup']}')"
    q["kcenter_sample"] = f"SELECT rank, vec_id, dist6 FROM read_parquet('{exp['kcenter_sample']}')"
    q["cell_convex_hull"] = f"SELECT cell, n_pts, n_hull, area6 FROM read_parquet('{exp['cell_convex_hull']}')"
    q["grid_dbscan"] = f"SELECT cell, cluster, n_pts FROM read_parquet('{exp['grid_dbscan']}')"
    q["dsir_sample"] = f"SELECT rank, doc_id, w FROM read_parquet('{exp['dsir_sample']}')"
    q["ann_recall"] = f"SELECT query_id, n_hit, recall4 FROM read_parquet('{exp['ann_recall']}')"
    q["kmv_overlap"] = f"SELECT type_a, type_b, kk, est_jac6, est_union3, est_inter3 FROM read_parquet('{exp['kmv_overlap']}')"
    q["neardup_eval"] = f"SELECT n_true, n_lsh, n_hit, precision4, recall4 FROM read_parquet('{exp['neardup_eval']}')"
    q["embed_pca"] = f"SELECT vec_id, pc1, pc2 FROM read_parquet('{exp['embed_pca']}')"
    q["embed_outliers"] = f"SELECT rank, vec_id, cluster, dist FROM read_parquet('{exp['embed_outliers']}')"
    q["src_js_divergence"] = f"SELECT src_a, src_b, js FROM read_parquet('{exp['src_js_divergence']}')"
    q["image_entropy"] = f"SELECT image_id, ok, entropy6, n_buckets FROM read_parquet('{exp['image_entropy']}')"
    q["way_kcore"] = f"SELECT way_id, core FROM read_parquet('{exp['way_kcore']}')"
    q["relation_multipolygons"] = (
        "SELECT relation_id, n_outer, n_inner, n_open, area6 FROM "
        f"read_parquet('{exp['relation_multipolygons']}')")
    q["audio_features"] = f"SELECT media_id, band, energy6 FROM read_parquet('{exp['audio_features']}')"
    q["video_frames"] = f"SELECT media_id, frame_idx, frame_len FROM read_parquet('{exp['video_frames']}')"

    # word_heavy_hitters: the CMS estimate is EXACT here by construction —
    # the synthetic vocabulary (31 words at sf0.01) is far below the
    # per-block candidate budget (128) so the candidate union is the full
    # vocabulary independent of block boundaries, and 31 keys in a
    # 4x8192 sketch make an estimation collision require a simultaneous
    # collision in all 4 depth rows (p ~ (31/8192)^4) — so exact SQL
    # counts are the ground truth the sketch must reproduce.
    q["word_heavy_hitters"] = """
        SELECT w AS value, CAST(n AS BIGINT) AS est_n FROM (
            SELECT w, count(*) AS n FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS w
                FROM documents)
            GROUP BY w ORDER BY n DESC, w ASC LIMIT 20)"""

    # way_sinuosity: osm_way_length's window-sum plan extended with the
    # arg_min/arg_max chord endpoints; chord haversine mirrors the engine
    # kernel term-for-term (hav(fx, fy, lx, ly) operand order), and the
    # keep decision applies to the ROUNDED chord (clip_filter contract)
    _sn_sdp = f"SIN(((ly * {_d2r}) - (fy * {_d2r})) / 2.0)"
    _sn_sdl = f"SIN(((lx - fx) * {_d2r}) / 2.0)"
    _sn_a = (f"LEAST({_sn_sdp} * {_sn_sdp} + COS(fy * {_d2r}) "
             f"* COS(ly * {_d2r}) * {_sn_sdl} * {_sn_sdl}, 1.0)")
    q["way_sinuosity"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                            generate_subscripts(refs, 1) AS seq,
                            len(refs) AS np
                     FROM {ways} WHERE len(refs) >= 2),
        pts AS (SELECT e.way_id, e.seq, e.np, n.lon AS x, n.lat AS y
                FROM exp e JOIN {nodes} n ON n.id = e.ref),
        seg AS (SELECT way_id, np, seq, x, y,
                       lead(x) OVER w AS x2, lead(y) OVER w AS y2
                FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        agg AS (SELECT way_id, max(np) AS np, count(*) AS resolved,
                       sum(CASE WHEN x2 IS NULL THEN 0.0
                                ELSE 2.0 * {EARTH_R_M!r}
                                     * ASIN(SQRT({_hava})) END) AS ln,
                       arg_min(x, seq) AS fx, arg_min(y, seq) AS fy,
                       arg_max(x, seq) AS lx, arg_max(y, seq) AS ly
                FROM seg GROUP BY way_id),
        ch AS (SELECT way_id, np, ln,
                      2.0 * {EARTH_R_M!r} * ASIN(SQRT({_sn_a})) AS chord
               FROM agg WHERE resolved = np)
        SELECT way_id, CAST(np AS BIGINT) AS n_points,
               {sql_round('ln', 3)} AS len_m3,
               {sql_round('chord', 3)} AS chord_m3,
               {sql_round('ln / chord', 4)} AS sinuosity4
        FROM ch WHERE {sql_round('chord', 3)} > 0.0"""

    # cell_diameter: brute-force within-cell pair self-join (image_id <
    # image_id dedup) + max haversine; the engine's hash(cell) exchange +
    # clique kernel must reproduce this exactly — haversine is
    # float-symmetric (squares/products only) so pair orientation is free
    _cd_sdp = f"SIN(((b.lat * {_d2r}) - (a.lat * {_d2r})) / 2.0)"
    _cd_sdl = f"SIN(((b.lon - a.lon) * {_d2r}) / 2.0)"
    _cd_a = (f"LEAST({_cd_sdp} * {_cd_sdp} + COS(a.lat * {_d2r}) "
             f"* COS(b.lat * {_d2r}) * {_cd_sdl} * {_cd_sdl}, 1.0)")
    q["cell_diameter"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT image_id, lon, lat,
                     {tiles.sql_cell_id('lon', 'lat', 7)} AS cell
              FROM pts),
        pr AS (SELECT a.cell,
                      2.0 * {EARTH_R_M!r} * ASIN(SQRT({_cd_a})) AS d
               FROM c a JOIN c b
                 ON a.cell = b.cell AND a.image_id < b.image_id),
        nn AS (SELECT cell, count(*) AS n FROM c GROUP BY cell)
        SELECT nn.cell AS cell_r7, CAST(nn.n AS BIGINT) AS n,
               {sql_round('COALESCE(max(pr.d), 0.0)', 3)} AS diam_m3
        FROM nn LEFT JOIN pr ON pr.cell = nn.cell
        GROUP BY nn.cell, nn.n"""

    # zipf_slope: full count + window rank + explicit closed-form OLS
    # sums (NOT regr_slope — its streaming formula differs; the explicit
    # sums mirror the engine's term order exactly). Tie rule at the
    # top-k cut: (count DESC, word ASC) on both sides.
    q["zipf_slope"] = f"""
        WITH toks AS (SELECT unnest({split_toks}) AS w FROM documents),
        wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        top AS (SELECT w, n FROM wc ORDER BY n DESC, w ASC LIMIT 100),
        pts AS (SELECT ln(CAST(row_number()
                               OVER (ORDER BY n DESC, w ASC) AS DOUBLE))
                         AS x,
                       ln(CAST(n AS DOUBLE)) AS y
                FROM top),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS kk, SUM(x) AS sx,
                     SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
              FROM pts),
        f AS (SELECT kk,
                     CASE WHEN kk * sxx - sx * sx = 0.0 THEN 0.0
                          ELSE (kk * sxy - sx * sy)
                               / (kk * sxx - sx * sx) END AS slope,
                     sx, sy
              FROM s)
        SELECT CAST(kk AS BIGINT) AS k,
               {sql_round('slope', 6)} AS slope6,
               {sql_round('(sy - slope * sx) / kk', 6)} AS intercept6
        FROM f"""

    # way_assortativity: Newman's r over both orientations of the
    # deduped shared-node edge set, reduced to four exact integer sums
    # so the float closed form is bit-identical to the engine's
    q["way_assortativity"] = f"""
        WITH exp AS (SELECT id AS way_id, unnest(refs) AS ref FROM {ways}),
        ed AS (SELECT DISTINCT a.way_id AS a, b.way_id AS b
               FROM exp a JOIN exp b ON a.ref = b.ref
               WHERE a.way_id < b.way_id),
        deg AS (SELECT v, count(*) AS d FROM
                  (SELECT a AS v FROM ed UNION ALL SELECT b AS v FROM ed)
                GROUP BY v),
        dm AS (SELECT CAST(count(*) AS BIGINT) AS nv,
                      CAST(SUM(d * d) AS BIGINT) AS s2,
                      CAST(SUM(d * d * d) AS BIGINT) AS s3
               FROM deg),
        em AS (SELECT CAST(count(*) AS BIGINT) AS m,
                      CAST(SUM(da.d * db.d) AS BIGINT) AS sxy
               FROM ed JOIN deg da ON da.v = ed.a
                       JOIN deg db ON db.v = ed.b)
        SELECT nv AS n_vertices, m AS n_edges,
               {sql_round(
                   'CASE WHEN (2.0 * m) * CAST(s3 AS DOUBLE)'
                   ' - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) = 0.0'
                   ' THEN 0.0'
                   ' ELSE ((2.0 * m) * (2.0 * sxy)'
                   ' - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))'
                   ' / ((2.0 * m) * CAST(s3 AS DOUBLE)'
                   ' - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) END', 6)}
                 AS assortativity6
        FROM dm, em"""

    # snap_to_segment: point x segment join PREFILTERED by the snap
    # radius against each segment's bbox (sound: d <= T implies the
    # point is within T of the bbox on both axes, so no in-radius pair
    # is lost and both sides minimize over a superset of the in-radius
    # set), with the engine kernel's exact expression tree — residuals
    # as (rx - t*dx), NOT (p - (a + t*dx)), which differs in float —
    # the (d2, way_id, seq) lexicographic tie rule via row_number, and
    # the final keep on RAW d2 <= T*T (identical float compare both
    # sides).  T mirrors snap_to_segment's max_snap_deg default.
    _sn_t = "0.005"
    q["snap_to_segment"] = f"""
        WITH {_pts_cte(images)},
        exp AS (SELECT id AS way_id, unnest(refs) AS ref,
                       generate_subscripts(refs, 1) AS seq FROM {ways}),
        pn AS (SELECT e.way_id, e.seq, n.lon AS x, n.lat AS y
               FROM exp e JOIN {nodes} n ON n.id = e.ref),
        sg AS (SELECT way_id, seq, x AS ax, y AS ay,
                      lead(x) OVER w AS bx, lead(y) OVER w AS by2
               FROM pn WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
        segs AS (SELECT * FROM sg WHERE bx IS NOT NULL),
        dv AS (SELECT p.image_id, s.way_id, s.seq,
                      p.lon - s.ax AS rx, p.lat - s.ay AS ry,
                      s.bx - s.ax AS dx, s.by2 - s.ay AS dy
               FROM pts p JOIN segs s
                 ON p.lon >= LEAST(s.ax, s.bx) - {_sn_t}
               WHERE p.lon <= GREATEST(s.ax, s.bx) + {_sn_t}
                 AND p.lat >= LEAST(s.ay, s.by2) - {_sn_t}
                 AND p.lat <= GREATEST(s.ay, s.by2) + {_sn_t}),
        tv AS (SELECT image_id, way_id, seq, rx, ry, dx, dy,
                      CASE WHEN dx * dx + dy * dy > 0.0
                           THEN LEAST(GREATEST(
                                  (rx * dx + ry * dy)
                                  / (dx * dx + dy * dy), 0.0), 1.0)
                           ELSE 0.0 END AS t
               FROM dv),
        dd AS (SELECT image_id, way_id, seq,
                      (rx - t * dx) * (rx - t * dx)
                        + (ry - t * dy) * (ry - t * dy) AS d2
               FROM tv),
        r AS (SELECT image_id, way_id, seq, d2,
                     row_number() OVER (PARTITION BY image_id
                                        ORDER BY d2, way_id, seq) AS rn
              FROM dd)
        SELECT image_id, way_id, CAST(seq AS BIGINT) AS seq,
               {sql_round('SQRT(d2)', 7)} AS dist_deg7
        FROM r WHERE rn = 1 AND d2 <= {_sn_t} * {_sn_t}"""

    # cell_kde: the engine's 9-offset candidate expansion written as a
    # VALUES cross join; grid constants 360/4096 and 180/4096 are exact
    # dyadic doubles, centers and kernel mirror the numpy expressions
    # term-for-term, the d2 < r2 keep is strict on both sides, and the
    # 6-digit rounding absorbs parallel-summation order noise
    q["cell_kde"] = f"""
        WITH {_pts_cte(images)},
        g AS (SELECT lon, lat,
                     CAST(FLOOR((lon + 180.0) / 360.0 * 4096.0) AS BIGINT)
                       AS gx,
                     CAST(FLOOR((lat + 90.0) / 180.0 * 4096.0) AS BIGINT)
                       AS gy
              FROM pts),
        offs AS (SELECT o1.dx, o2.dy
                 FROM (VALUES (-1), (0), (1)) o1(dx),
                      (VALUES (-1), (0), (1)) o2(dy)),
        cand AS (SELECT g.lon, g.lat, g.gx + o.dx AS gx2, g.gy + o.dy AS gy2
                 FROM g CROSS JOIN offs o
                 WHERE g.gx + o.dx BETWEEN 0 AND 4095
                   AND g.gy + o.dy BETWEEN 0 AND 4095),
        d AS (SELECT gx2, gy2,
                     (lon - ((CAST(gx2 AS DOUBLE) + 0.5)
                             * (360.0 / 4096.0) - 180.0)) AS dxc,
                     (lat - ((CAST(gy2 AS DOUBLE) + 0.5)
                             * (180.0 / 4096.0) - 90.0)) AS dyc
              FROM cand),
        k AS (SELECT gx2, gy2, dxc * dxc + dyc * dyc AS d2 FROM d
              WHERE dxc * dxc + dyc * dyc < 0.05 * 0.05)
        SELECT gx2 AS gx, gy2 AS gy, CAST(count(*) AS BIGINT) AS n,
               {sql_round('sum((1.0 - d2 / (0.05 * 0.05))'
                          ' * (1.0 - d2 / (0.05 * 0.05)))', 6)} AS kde6
        FROM k GROUP BY gx2, gy2"""

    # term_cell_lift: the engine's three-stage marginalization written
    # flat — pair counts, token/cell marginals over the pair table, and
    # the lift quotient with the exact float shape (CAST-to-double
    # numerator and denominator products)
    _tcl_lon, _tcl_lat = morton.sql_decode_exprs("phash")
    q["term_cell_lift"] = f"""
        WITH cp AS (SELECT caption, {_tcl_lon} AS lon, {_tcl_lat} AS lat
                    FROM {images}),
        tk AS (SELECT {tiles.sql_cell_id('lon', 'lat', 5)} AS cell,
                      unnest(list_filter(string_split(lower(caption), ' '),
                                         _w -> _w <> '')) AS token
               FROM cp),
        pairs AS (SELECT token, cell, CAST(count(*) AS BIGINT) AS n
                  FROM tk GROUP BY token, cell),
        tot_t AS (SELECT token, sum(n) AS nt FROM pairs GROUP BY token),
        tot_c AS (SELECT cell, sum(n) AS nc FROM pairs GROUP BY cell),
        nn AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM pairs)
        SELECT p.cell AS cell_r5, p.token, p.n,
               {sql_round('(CAST(p.n AS DOUBLE) * nn.total)'
                          ' / (CAST(t.nt AS DOUBLE)'
                          ' * CAST(c.nc AS DOUBLE))', 6)} AS lift6
        FROM pairs p JOIN tot_t t ON t.token = p.token
             JOIN tot_c c ON c.cell = p.cell, nn
        WHERE p.n >= 5"""

    # cell_anisotropy: moments about the EXACT per-cell min corner (min
    # is order-free float-exact, unlike a mean), then the engine's
    # covariance / eigenvalue / angle expressions term-for-term; 6-digit
    # rounding absorbs summation-order noise on the bounded centered
    # terms (see the engine docstring's float contract)
    _an_l1 = "((cxx + cyy) + disc) / 2.0"
    _an_l2 = "((cxx + cyy) - disc) / 2.0"
    q["cell_anisotropy"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT lon, lat,
                     {tiles.sql_cell_id('lon', 'lat', 7)} AS cell
              FROM pts),
        m AS (SELECT cell, min(lon) AS ml, min(lat) AS mb,
                     count(*) AS n
              FROM c GROUP BY cell),
        d AS (SELECT c.cell, m.n, c.lon - m.ml AS dx, c.lat - m.mb AS dy
              FROM c JOIN m USING (cell)),
        s AS (SELECT cell, max(n) AS n, CAST(max(n) AS DOUBLE) AS nd,
                     SUM(dx) AS sx, SUM(dy) AS sy, SUM(dx * dx) AS sxx,
                     SUM(dy * dy) AS syy, SUM(dx * dy) AS sxy
              FROM d GROUP BY cell),
        e AS (SELECT cell, n,
                     sxx / nd - (sx / nd) * (sx / nd) AS cxx,
                     syy / nd - (sy / nd) * (sy / nd) AS cyy,
                     sxy / nd - (sx / nd) * (sy / nd) AS cxy
              FROM s),
        f AS (SELECT cell, n, cxx, cyy, cxy,
                     SQRT((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy)
                       AS disc
              FROM e)
        SELECT cell AS cell_r7, CAST(n AS BIGINT) AS n,
               {sql_round('0.5 * atan2(2.0 * cxy, cxx - cyy)', 6)}
                 AS angle6,
               {sql_round(
                   f'CASE WHEN {_an_l1} > 0.0'
                   f' THEN SQRT(GREATEST(1.0 - ({_an_l2}) / ({_an_l1}),'
                   ' 0.0)) ELSE 0.0 END', 6)} AS ecc6
        FROM f"""


    # TPC-H Q4 shape: EXISTS late-lineitem semi-join, counted by
    # priority ("late" = shipped >90 days after order date; the
    # testdata has no commit/receipt dates)
    q["q4_late_orders"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate
                                           + INTERVAL 90 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""

    # TPC-H Q6 shape: one filtered scalar aggregate, integer-cents
    # per-row rounding mirrors the engine's order-free sum
    q["q6_revenue_delta"] = """
        SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                        AS BIGINT)) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0"""

    # TPC-H Q10 shape: returned-item revenue per customer for one
    # order quarter, top-20 (revenue DESC, custkey ASC tiebreak)
    q["q10_returned_revenue"] = """
        SELECT c.c_custkey, c.c_name, n.n_name,
               SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                              * 100) AS BIGINT)) AS revenue_cents
        FROM lineitem l, orders o, customer c, nation n
        WHERE l.l_orderkey = o.o_orderkey
          AND o.o_custkey = c.c_custkey
          AND c.c_nationkey = n.n_nationkey
          AND l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1995-07-01'
          AND o.o_orderdate <  TIMESTAMP '1995-10-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue_cents DESC, c_custkey LIMIT 20"""

    # TPC-H Q13 shape: order-count distribution incl. the zero bucket
    q["q13_order_distribution"] = """
        WITH per AS (SELECT c.c_custkey,
                            CAST(count(o.o_orderkey) AS BIGINT) AS c_count
                     FROM customer c LEFT JOIN orders o
                       ON c.c_custkey = o.o_custkey
                     GROUP BY c.c_custkey)
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""

    # TPC-H Q18 shape: HAVING sum(qty) filter then join, top-100 by
    # order value (total DESC, orderkey ASC tiebreak)
    q["q18_big_baskets"] = """
        WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
                     FROM lineitem GROUP BY l_orderkey
                     HAVING SUM(l_quantity) > 250.0)
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
               big.sum_qty
        FROM big, orders o, customer c
        WHERE big.l_orderkey = o.o_orderkey
          AND o.o_custkey = c.c_custkey
        ORDER BY total_cents DESC, o_orderkey LIMIT 100"""

    # weekly cohort retention: distinct (user, week) pairs, cohort =
    # first week; integer epoch-us day/week arithmetic on both sides
    q["cohort_retention"] = """
        WITH uw AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 // 7 AS w
                    FROM events),
        f AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id)
        SELECT f.cw AS cohort_week, uw.w - f.cw AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM uw JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2"""

    # exact-decile customer value segmentation: quantile_disc
    # thresholds (ceil(n*p)-1 order stat) then decile = count of
    # thresholds strictly below the value — integer-cents sums so no
    # float summation-order drift
    q["customer_value_deciles"] = """
        WITH s AS (SELECT o_custkey,
                          SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                            AS v
                   FROM orders GROUP BY o_custkey),
        t AS (SELECT quantile_disc(CAST(v AS DOUBLE),
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                AS th FROM s),
        d AS (SELECT v, (SELECT CAST(count(*) AS BIGINT)
                         FROM unnest((SELECT th FROM t)) AS z(u)
                         WHERE z.u < CAST(s.v AS DOUBLE)) AS decile
              FROM s)
        SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
               SUM(v) AS sum_value_cents
        FROM d GROUP BY decile ORDER BY decile"""

    # perceptual-signature diversity per res-7 cell (low-16-bit phash
    # signatures); bitwise & parenthesized for DuckDB precedence
    q["cell_phash_diversity"] = f"""
        WITH p2 AS (SELECT phash,
                      {morton.sql_decode_exprs('phash')[0]} AS lon,
                      {morton.sql_decode_exprs('phash')[1]} AS lat
                    FROM {images}),
        b AS (SELECT {tiles.sql_cell_id('lon', 'lat', 7)} AS cell,
                     (phash & 65535) AS sig FROM p2)
        SELECT cell, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT sig) AS BIGINT) AS n_sig,
               {sql_round('count(DISTINCT sig) / CAST(count(*) AS DOUBLE)', 6)}
                   AS diversity6
        FROM b GROUP BY cell"""

    # quadtree occupancy: occupied z14 descendants per occupied z10
    # tile; // floor-division mirrors the engine's >> rollup
    q["tile_coverage"] = f"""
        WITH {_pts_cte(images)},
        f AS (SELECT {tiles.sql_tile_x('lon', 14)} AS fx,
                     {tiles.sql_tile_y('lat', 14)} AS fy,
                     CAST(count(*) AS BIGINT) AS pn
              FROM pts GROUP BY 1, 2)
        SELECT fx // 16 AS tile_x, fy // 16 AS tile_y,
               CAST(count(*) AS BIGINT) AS n_subtiles,
               CAST(SUM(pn) AS BIGINT) AS n_pts,
               {sql_round('count(*) / 256.0', 6)} AS coverage6
        FROM f GROUP BY 1, 2"""

    # order-insensitive two-channel table digest: Horner chains mod
    # 2^31-1 keep every product under 2^48 (exact BIGINT, no
    # wraparound divergence); SUM of row hashes is commutative
    _ck = ("(((((ok * {m} + ln) % 2147483647) * {m} + q) % 2147483647)"
           " * {m} + ec) % 2147483647")
    q["lineitem_checksum"] = f"""
        WITH r AS (SELECT
              (l_orderkey % 2147483647) AS ok,
              (l_linenumber % 2147483647) AS ln,
              (CAST(l_quantity AS BIGINT) % 2147483647) AS q,
              (CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               % 2147483647) AS ec
            FROM lineitem),
        h AS (SELECT {_ck.format(m=65539)} AS h1,
                     {_ck.format(m=69623)} AS h2 FROM r)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(h1) % 2147483647 AS BIGINT) AS checksum1,
               CAST(SUM(h2) % 2147483647 AS BIGINT) AS checksum2
        FROM h"""

    # one-pass column profiler: integer-scaled sums make the means
    # order-free; division order ((s / scale) / n) mirrors the engine
    _prof = []
    for _c, _s in (("l_quantity", "1.0"), ("l_extendedprice", "100.0"),
                   ("l_discount", "100.0")):
        _prof.append(f"""
        SELECT '{_c}' AS "column", CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT {_c}) AS BIGINT) AS n_distinct,
               {sql_round(f'min({_c})', 6)} AS min6,
               {sql_round(f'max({_c})', 6)} AS max6,
               {sql_round(f'(SUM(CAST(ROUND({_c} * {_s}) AS BIGINT)) / {_s}) / count(*)', 6)}
                   AS mean6
        FROM lineitem""")
    q["lineitem_profile"] = " UNION ALL ".join(_prof)

    # TPC-H Q14 shape: promo revenue share for one ship quarter;
    # per-row integer cents, share = 100.0 * promo / total in DOUBLE
    q["q14_promo_revenue"] = f"""
        WITH li AS (SELECT l_partkey,
                      SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * 100) AS BIGINT)) AS rc
                    FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
                      AND l_shipdate <  TIMESTAMP '1996-06-01'
                    GROUP BY 1),
        j AS (SELECT li.rc, p.p_type
              FROM li JOIN part p ON p.p_partkey = li.l_partkey),
        s AS (SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rc
                                   ELSE 0 END) AS BIGINT) AS pr,
                     CAST(SUM(rc) AS BIGINT) AS tt FROM j)
        SELECT pr AS promo_rev_cents, tt AS total_rev_cents,
               {sql_round('100.0 * pr / tt', 6)} AS promo_share6
        FROM s"""

    # TPC-H Q15 shape: max-revenue supplier(s) for one ship quarter
    # (ties kept; exact because revenue is integer cents)
    q["q15_top_supplier"] = f"""
        WITH r AS (SELECT l_suppkey,
                     SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                              * 100) AS BIGINT)) AS rev
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate <  TIMESTAMP '1996-04-01'
                   GROUP BY 1)
        SELECT s.s_suppkey, s.s_name,
               CAST(r.rev AS BIGINT) AS total_revenue_cents
        FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.rev = (SELECT max(rev) FROM r)"""

    # TPC-H Q2 shape (lineitem as the part-supplier incidence; cost =
    # min extendedprice cents): min-cost EUROPE supplier per surviving
    # part, ties kept — the correlated-min-subquery shape
    q["q2_min_cost_supplier"] = """
        WITH pp AS (SELECT p_partkey, p_brand FROM part
                    WHERE p_size IN (5, 15, 25, 35, 45)
                      AND p_type IN ('STANDARD', 'ECONOMY')),
        eu AS (SELECT s_suppkey, s_name, n_name,
                      CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_cents
               FROM supplier s
               JOIN nation n ON n.n_nationkey = s.s_nationkey
               JOIN region r ON r.r_regionkey = n.n_regionkey
               WHERE r.r_name = 'EUROPE'),
        cost AS (SELECT l.l_partkey, l.l_suppkey,
                        MIN(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                          AS cost_cents
                 FROM lineitem l
                 JOIN pp ON pp.p_partkey = l.l_partkey
                 GROUP BY 1, 2),
        pc AS (SELECT c.l_partkey, c.l_suppkey, c.cost_cents
               FROM cost c JOIN eu ON eu.s_suppkey = c.l_suppkey),
        m AS (SELECT l_partkey, MIN(cost_cents) AS mc FROM pc GROUP BY 1)
        SELECT pc.l_partkey AS p_partkey, pp.p_brand, eu.s_name, eu.n_name,
               eu.acctbal_cents, pc.cost_cents
        FROM pc
        JOIN m ON m.l_partkey = pc.l_partkey AND pc.cost_cents = m.mc
        JOIN eu ON eu.s_suppkey = pc.l_suppkey
        JOIN pp ON pp.p_partkey = pc.l_partkey"""

    # TPC-H Q16 shape (lineitem as the part-supplier incidence):
    # distinct shippers per surviving (brand, type, size) bucket
    q["q16_part_suppliers"] = """
        WITH pr AS (SELECT p_partkey, p_brand, p_type, p_size FROM part
                    WHERE p_brand <> 'Brand#4' AND p_type <> 'ECONOMY'
                      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49))
        SELECT pr.p_brand, pr.p_type, CAST(pr.p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l JOIN pr ON pr.p_partkey = l.l_partkey
        GROUP BY 1, 2, 3"""

    # TPC-H Q17 shape over ALL parts: quantities are integral doubles,
    # so SUM/avg are order-free and the 0.2*avg cut is bit-identical
    q["q17_small_qty"] = f"""
        WITH a AS (SELECT l_partkey,
                          0.2 * (SUM(l_quantity) / count(*)) AS cut
                   FROM lineitem GROUP BY 1),
        s AS (SELECT l.l_extendedprice
              FROM lineitem l JOIN a ON a.l_partkey = l.l_partkey
              WHERE l.l_quantity < a.cut),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n_small,
                     CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100)
                              AS BIGINT)), 0) AS BIGINT) AS rev_cents
              FROM s)
        SELECT n_small, rev_cents,
               {sql_round('rev_cents / 100.0 / 7.0', 6)} AS avg_yearly6
        FROM t"""

    # TPC-H Q19 shape: disjunction of (brand, size-range, qty-range)
    # condition sets over the lineitem x part join
    q["q19_brand_revenue"] = """
        SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice
                 * (1 - l_discount) * 100) AS BIGINT)), 0) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity >= 1.0 AND l.l_quantity <= 11.0)
           OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity >= 10.0 AND l.l_quantity <= 20.0)
           OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 20.0 AND l.l_quantity <= 30.0)"""

    # TPC-H Q22 shape (mktsegment for the phone prefix): above-average
    # positive balance, no orders; integer cents make the avg exact
    q["q22_idle_customers"] = """
        WITH c AS (SELECT c_custkey, c_mktsegment,
                          CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
                   FROM customer),
        a AS (SELECT AVG(cents) AS avg_cents FROM c WHERE cents > 0),
        idle AS (SELECT c.c_mktsegment, c.cents
                 FROM c, a WHERE c.cents > a.avg_cents
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey
                                     AND o.o_totalprice > 300000.0))
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
               CAST(SUM(cents) AS BIGINT) AS sum_acctbal_cents
        FROM idle GROUP BY 1"""

    # TPC-H Q8 shape: one supplying nation's share of ship-year revenue
    # inside one consuming region; integer-cents sums make share6 exact
    q["q8_market_share"] = f"""
        WITH cust AS (SELECT c_custkey FROM customer c
                      JOIN nation n ON n.n_nationkey = c.c_nationkey
                      JOIN region r ON r.r_regionkey = n.n_regionkey
                      WHERE r.r_name = 'ASIA'),
        tk AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7'),
        li AS (SELECT CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                      CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                           * 100) AS BIGINT) AS rc,
                      CASE WHEN s.s_nationkey = tk.n_nationkey
                           THEN 1 ELSE 0 END AS flag
               FROM lineitem l
               JOIN orders o ON o.o_orderkey = l.l_orderkey
               JOIN cust ON cust.c_custkey = o.o_custkey
               JOIN supplier s ON s.s_suppkey = l.l_suppkey, tk)
        SELECT l_year, CAST(SUM(rc) AS BIGINT) AS total_cents,
               CAST(SUM(rc * flag) AS BIGINT) AS nation_cents,
               {sql_round('SUM(rc * flag) * 1.0 / SUM(rc)', 6)} AS share6
        FROM li GROUP BY 1"""

    # TPC-H Q9 shape, cost proxy = 60% of p_retailprice in cents;
    # quantities are integral so qty*cost is exact BIGINT on both sides
    q["q9_profit_proxy"] = """
        SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                        * 100) AS BIGINT)
                    - CAST(l.l_quantity AS BIGINT)
                      * CAST(ROUND(p.p_retailprice * 60) AS BIGINT))
                    AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY 1, 2"""

    # Herfindahl-Hirschman supplier-concentration index per nation:
    # per-supplier quantity sums are exact BIGINTs (integral
    # quantities); sum(q*q) stays exact (DuckDB sums BIGINT into
    # HUGEINT); exactly one float division, rounded half-away at 6 dp
    q["supplier_hhi"] = f"""
        WITH ps AS (SELECT l_suppkey,
                           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                               AS q
                    FROM lineitem GROUP BY 1),
        j AS (SELECT n.n_name, ps.q
              FROM ps
              JOIN supplier s ON s.s_suppkey = ps.l_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey),
        a AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
                     CAST(sum(q) AS BIGINT) AS tot,
                     CAST(sum(q * q) AS BIGINT) AS sq
              FROM j GROUP BY 1)
        SELECT n_name, n_suppliers, tot AS total_qty,
               {sql_round('CAST(sq AS DOUBLE) / CAST(tot * tot AS DOUBLE)',
                          6)} AS hhi6
        FROM a"""

    # TPC-H Q11 shape: parts whose revenue exceeds mult x the mean
    # per-part revenue (scale-free cut; exact int64 sums, float64
    # cutoff computed identically on both sides)
    q["q11_important_parts"] = """
        WITH v AS (SELECT l_partkey,
                          SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                              AS vc
                   FROM lineitem GROUP BY 1)
        SELECT l_partkey, CAST(vc AS BIGINT) AS value_cents
        FROM v WHERE vc > 1.2 * ((SELECT SUM(vc) FROM v) * 1.0
                                 / (SELECT count(*) FROM v))"""

    # ripley_k: brute-force within-cell pair self-join (same kernel and
    # ROUND-before-threshold contract as cell_diameter/radius_join); the
    # engine's lat-band pruned candidate kernel must reproduce these
    # exact integer pair counts
    _rk_sdp = f"SIN(((b.lat * {_d2r}) - (a.lat * {_d2r})) / 2.0)"
    _rk_sdl = f"SIN(((b.lon - a.lon) * {_d2r}) / 2.0)"
    _rk_a = (f"LEAST({_rk_sdp} * {_rk_sdp} + COS(a.lat * {_d2r}) "
             f"* COS(b.lat * {_d2r}) * {_rk_sdl} * {_rk_sdl}, 1.0)")
    _rk_d = sql_round(f"2.0 * {EARTH_R_M!r} * ASIN(SQRT({_rk_a}))", 3)
    q["ripley_k"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT image_id, lon, lat,
                     {tiles.sql_cell_id('lon', 'lat', 7)} AS cell
              FROM pts),
        pr AS (SELECT a.cell, {_rk_d} AS d
               FROM c a JOIN c b
                 ON a.cell = b.cell AND a.image_id < b.image_id),
        nn AS (SELECT cell, count(*) AS n FROM c GROUP BY cell)
        SELECT nn.cell AS cell_r7, CAST(nn.n AS BIGINT) AS n,
               CAST(COALESCE(SUM(CASE WHEN pr.d <= 100.0
                                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS le100,
               CAST(COALESCE(SUM(CASE WHEN pr.d <= 300.0
                                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS le300,
               CAST(COALESCE(SUM(CASE WHEN pr.d <= 1000.0
                                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS le1000
        FROM nn LEFT JOIN pr ON pr.cell = nn.cell
        GROUP BY nn.cell, nn.n"""

    # cell_nn_stats: brute-force per-point nearest neighbour inside the
    # cell (min of per-pair integer-millimetre distances; min commutes
    # with the monotone rounding, so the engine may round after its
    # grid-search min).  Same haversine term order as radius_join.
    _nnmm = sql_round(f"2.0 * {EARTH_R_M!r} * ASIN(SQRT({_rk_a})) * 1000.0",
                      0)
    q["cell_nn_stats"] = f"""
        WITH {_pts_cte(images)},
        c AS (SELECT image_id, lon, lat,
                     {tiles.sql_cell_id('lon', 'lat', 7)} AS cell
              FROM pts),
        d AS (SELECT a.cell, a.image_id, CAST({_nnmm} AS BIGINT) AS mm
              FROM c a JOIN c b
                ON a.cell = b.cell AND a.image_id <> b.image_id),
        nnp AS (SELECT cell, image_id, min(mm) AS mm FROM d GROUP BY 1, 2)
        SELECT cell AS cell_r7, CAST(count(*) AS BIGINT) AS n,
               {sql_round('CAST(SUM(mm) AS DOUBLE) '
                          '/ (CAST(count(*) AS DOUBLE) * 1000.0)', 6)}
                   AS nn_mean6,
               CAST(min(mm) AS DOUBLE) / 1000.0 AS nn_min3,
               CAST(max(mm) AS DOUBLE) / 1000.0 AS nn_max3
        FROM nnp GROUP BY cell"""

    # sweep-line peak concurrency: half-open [ts, ts+dur) intervals, so
    # ends sort before starts at equal timestamps (ORDER BY t, d); all
    # int64 epoch-us arithmetic, exact on both sides
    q["events_concurrency"] = """
        WITH b AS (
          SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d
          FROM events
          UNION ALL
          SELECT event_type,
                 CAST(epoch_us(ts) AS BIGINT)
                   + (60 + CAST(FLOOR(value) AS BIGINT)) * 1000000,
                 -1
          FROM events),
        r AS (SELECT event_type,
                     SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                                  ROWS UNBOUNDED PRECEDING) AS c
              FROM b)
        SELECT event_type, CAST(count(*) // 2 AS BIGINT) AS n_events,
               CAST(max(c) AS BIGINT) AS peak
        FROM r GROUP BY 1"""

    # raster_contour: brute-force marching squares over the zoom-16
    # count raster — candidate cells from the 4 offsets of every
    # occupied pixel, corner values by coordinate LEFT JOIN, the same
    # case tables as the engine (saddles need no ambiguity rule: both
    # resolutions give 2 diagonal segments)
    q["raster_contour"] = f"""
        WITH {_pts_cte(images)}, {_g16},
        cand AS (SELECT DISTINCT gx + o.dx AS cx, gy + o.dy AS cy
                 FROM c, (VALUES (0, 0), (-1, 0), (0, -1), (-1, -1))
                      AS o(dx, dy)),
        lv AS (SELECT * FROM (VALUES (1), (4), (16)) AS l(level)),
        cs AS (SELECT l.level,
                      (CASE WHEN tl.n >= l.level THEN 8 ELSE 0 END
                       + CASE WHEN tr.n >= l.level THEN 4 ELSE 0 END
                       + CASE WHEN br.n >= l.level THEN 2 ELSE 0 END
                       + CASE WHEN bl.n >= l.level THEN 1 ELSE 0 END)
                          AS k
               FROM cand cd CROSS JOIN lv l
               LEFT JOIN c tl ON tl.gx = cd.cx AND tl.gy = cd.cy
               LEFT JOIN c tr ON tr.gx = cd.cx + 1 AND tr.gy = cd.cy
               LEFT JOIN c bl ON bl.gx = cd.cx AND bl.gy = cd.cy + 1
               LEFT JOIN c br ON br.gx = cd.cx + 1
                             AND br.gy = cd.cy + 1),
        seg AS (SELECT level,
                       CASE WHEN k IN (0, 15) THEN 0
                            WHEN k IN (5, 10) THEN 2 ELSE 1 END AS nseg,
                       CASE WHEN k IN (3, 6, 9, 12) THEN 1 ELSE 0 END
                           AS nstr,
                       CASE WHEN k IN (5, 10) THEN 2
                            WHEN k IN (0, 3, 6, 9, 12, 15) THEN 0
                            ELSE 1 END AS ndia
                FROM cs)
        SELECT CAST(level AS BIGINT) AS level,
               CAST(SUM(CASE WHEN nseg > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cells,
               CAST(SUM(nseg) AS BIGINT) AS n_segments,
               CAST(SUM(nstr) AS BIGINT) AS n_straight,
               CAST(SUM(ndia) AS BIGINT) AS n_diag,
               {sql_round('SUM(nstr) * 1.0 '
                          '+ SUM(ndia) * 0.7071067811865476', 6)} AS len6
        FROM seg GROUP BY 1"""

    # grouped argmax with the exact (value DESC, suppkey ASC) tie rule;
    # integer-cents sums make the comparison order-free
    q["part_top_supplier"] = """
        WITH v AS (SELECT l_partkey, l_suppkey,
                          SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                              AS vc
                   FROM lineitem GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey
                                           ORDER BY vc DESC,
                                                    l_suppkey ASC) AS rn
              FROM v)
        SELECT l_partkey, l_suppkey AS s_best,
               CAST(vc AS BIGINT) AS value_cents
        FROM r WHERE rn = 1"""

    # streaming watermark accounting: running max ts in ascending
    # event_id (arrival) order, strictly-prior window; all int64 epoch
    # microseconds so the lateness filter and floor-divided sums are
    # exact on both sides
    q["events_late_arrivals"] = """
        WITH w AS (SELECT event_type,
                          CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                          max(ts) OVER (PARTITION BY event_type
                                        ORDER BY event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) AS wm
                   FROM events)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN wm IS NOT NULL
                             AND CAST(epoch_us(wm) AS BIGINT) - ts_us
                                 > 3600000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(COALESCE(SUM(CASE WHEN wm IS NOT NULL
                             AND CAST(epoch_us(wm) AS BIGINT) - ts_us
                                 > 3600000000
                             THEN (CAST(epoch_us(wm) AS BIGINT) - ts_us)
                                  // 1000000 END), 0) AS BIGINT)
                   AS sum_late_s
        FROM w GROUP BY 1"""

    # last-touch attribution: credit each purchase to the user's most
    # recent PRIOR non-purchase event; micro-unit value sums are exact
    q["events_attribution"] = """
        WITH w AS (SELECT event_type, value,
                          COALESCE(LAST_VALUE(CASE WHEN event_type
                                   <> 'purchase' THEN event_type END
                                   IGNORE NULLS)
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 'none')
                              AS attrib_type
                   FROM events)
        SELECT attrib_type, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS value_u6
        FROM w WHERE event_type = 'purchase' GROUP BY 1"""

    # TPC-H Q12 mirror: window + join + conditional priority counts
    q["q12_priority_by_status"] = """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN
                             ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN
                             ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus ORDER BY l_linestatus"""

    # TPC-H Q20 mirror: per-supplier promo share vs the GLOBAL promo
    # share, exact integer cross-multiply (HUGEINT avoids overflow)
    q["q20_promo_share"] = """
        WITH v AS (SELECT l.l_suppkey,
                          SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(ROUND(l.l_quantity) AS BIGINT)
                              ELSE 0 END) AS pq,
                          SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS tq
                   FROM lineitem l JOIN part p
                        ON p.p_partkey = l.l_partkey
                   GROUP BY 1),
        g AS (SELECT SUM(pq) AS gpq, SUM(tq) AS gtq FROM v)
        SELECT s.s_name, CAST(v.pq AS BIGINT) AS promo_qty,
               CAST(v.tq AS BIGINT) AS total_qty
        FROM v JOIN supplier s ON s.s_suppkey = v.l_suppkey
        WHERE CAST(v.pq AS HUGEINT) * (SELECT gtq FROM g)
              > (SELECT gpq FROM g) * CAST(v.tq AS HUGEINT)
        ORDER BY s.s_name"""

    # TPC-H Q21 mirror: sole-late supplier on multi-supplier 'F'
    # orders (EXISTS/NOT-EXISTS collapsed to per-order counts)
    q["q21_waiting_suppliers"] = """
        WITH ls AS (SELECT l_orderkey, l_suppkey,
                           max(l_shipdate) AS sd
                    FROM lineitem GROUP BY 1, 2),
        j AS (SELECT ls.l_orderkey, ls.l_suppkey,
                     CASE WHEN ls.sd > o.o_orderdate + INTERVAL 60 DAY
                          THEN 1 ELSE 0 END AS is_late
              FROM ls JOIN orders o ON o.o_orderkey = ls.l_orderkey
              WHERE o.o_orderstatus = 'F'),
        f AS (SELECT l_orderkey, count(*) AS n_supp,
                     SUM(is_late) AS n_late
              FROM j GROUP BY 1)
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM j JOIN f USING (l_orderkey)
        JOIN supplier s ON s.s_suppkey = j.l_suppkey
        WHERE j.is_late = 1 AND f.n_supp >= 2 AND f.n_late = 1
        GROUP BY 1 ORDER BY numwait DESC, s_name"""

    return {k: " ".join(v.split()) for k, v in q.items()}
