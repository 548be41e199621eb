"""Geo / spatial queries over planar points — the XYPoint family
(lucene/core/src/java/org/apache/lucene/document/XYPointField.java,
XYShape / XYRectangle geometry) plus the heatmap facet
(solr/core/src/java/org/apache/solr/handler/component/
SpatialHeatmapFacets.java): rectangle containment, nearest-neighbour by
planar distance, and grid-cell count facets.

Lucene ships BOTH spherical (LatLonPoint) and planar (XYPoint) geometry;
we implement the planar family, whose arithmetic (+,−,×, floor, compare)
is IEEE-deterministic in numpy AND DuckDB — so every gate below is
bit-exact hash-gated, with no libm-trig ulp risk.  The spherical
distance variant would slot into the same pipelines with a haversine
kernel (documented, not gated, because np.sin/cos and DuckDB sin/cos may
differ in the last ulp).

The events table carries no coordinates, so both sides DERIVE a
deterministic planar point from `event_id` (dense at every scale factor)
with pure integer arithmetic (identical in numpy and SQL):

    x = ((event_id * 37)  % 2000) / 10.0 - 100.0   ∈ [-100, 100)
    y = ((event_id * 101) % 1000) / 10.0 -  50.0   ∈ [ -50,  50)

Scale: all three pipelines are single-pass map_batches with per-batch
combiners (bbox emits matching ids only; knn keeps a per-batch top-k;
heatmap counts a BOUNDED grid) — nothing vocabulary- or row-sized ever
shuffles or lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .common import Pipeline, read

# query geometry (fixed, mirrored into the SQL twins)
BBOX = (-30.0, 20.0, -25.0, 10.0)  # x_min, x_max, y_min, y_max
Q_X, Q_Y = 12.5, -7.5  # knn query point
GRID_STEP = 25.0  # heatmap cell edge
KNN_K = 15


def _xy(event_id: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    u = event_id.to_numpy(np.int64)
    x = ((u * 37) % 2000) / 10.0 - 100.0
    y = ((u * 101) % 1000) / 10.0 - 50.0
    return x, y


_XY_SQL = """
  SELECT event_id,
         ((event_id * 37)  % 2000) / 10.0 - 100.0 AS x,
         ((event_id * 101) % 1000) / 10.0 -  50.0 AS y
  FROM events
"""


def geo_bbox(sf_dir: str):
    """XYPointField.newRangeQuery: events inside the query rectangle."""
    x0, x1, y0, y1 = BBOX

    def inside(batch: pd.DataFrame) -> pd.DataFrame:
        x, y = _xy(batch["event_id"])
        m = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(np.int64)[m], "x": x[m], "y": y[m]}
        )

    out = read(sf_dir, "events", ["event_id"]).map_batches(inside, batch_format="pandas")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


GEO_BBOX_SQL = f"""
SELECT event_id, x, y FROM ({_XY_SQL})
WHERE x >= {BBOX[0]} AND x <= {BBOX[1]} AND y >= {BBOX[2]} AND y <= {BBOX[3]}
ORDER BY event_id
"""


def geo_knn(sf_dir: str):
    """Nearest events to the query point by planar distance² (the
    XYPoint nearest-neighbour shape): per-batch top-k combiner, driver
    merges k-sized partials only."""

    def topk(batch: pd.DataFrame) -> pd.DataFrame:
        x, y = _xy(batch["event_id"])
        d2 = (x - Q_X) * (x - Q_X) + (y - Q_Y) * (y - Q_Y)
        out = pd.DataFrame({"event_id": batch["event_id"].to_numpy(np.int64), "dist2": d2})
        return out.sort_values(["dist2", "event_id"]).head(KNN_K)

    parts = (
        read(sf_dir, "events", ["event_id"])
        .map_batches(topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per batch
    )
    top = parts.sort_values(["dist2", "event_id"]).head(KNN_K).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "event_id", "dist2"]]


GEO_KNN_SQL = f"""
SELECT CAST(row_number() OVER (ORDER BY dist2, event_id) AS BIGINT) AS rank,
       event_id, dist2
FROM (
  SELECT event_id,
         (x - {Q_X}) * (x - {Q_X}) + (y - {Q_Y}) * (y - {Q_Y}) AS dist2
  FROM ({_XY_SQL})
)
ORDER BY dist2, event_id LIMIT {KNN_K}
"""


def geo_heatmap(sf_dir: str):
    """Heatmap facet: counts per fixed grid cell (SpatialHeatmapFacets'
    gridLevel counts).  The grid is BOUNDED (world / step cells), so
    per-batch cell-count partials merge on the coordinator — the
    facet-partials pattern, no Ray all-to-all."""

    def cells(batch: pd.DataFrame) -> pd.DataFrame:
        x, y = _xy(batch["event_id"])
        cx = np.floor(x / GRID_STEP)
        cy = np.floor(y / GRID_STEP)
        df = pd.DataFrame({"cell_x": cx, "cell_y": cy})
        return df.groupby(["cell_x", "cell_y"], as_index=False).size().rename(columns={"size": "n"})

    parts = (
        read(sf_dir, "events", ["event_id"]).map_batches(cells, batch_format="pandas").to_pandas()
    )
    out = parts.groupby(["cell_x", "cell_y"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)


GEO_HEATMAP_SQL = f"""
SELECT floor(x / {GRID_STEP}) AS cell_x, floor(y / {GRID_STEP}) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ({_XY_SQL})
GROUP BY cell_x, cell_y ORDER BY cell_x, cell_y
"""


# concave test polygon (closed implicitly); vertices on the 0.5 grid so
# they never coincide with derived event coordinates' exact y values
POLYGON = [(-40.5, -20.5), (10.5, -35.5), (35.5, 5.5), (0.5, 2.5), (-25.5, 30.5)]


def geo_polygon(sf_dir: str):
    """XYShape `Intersects(POLYGON(...))` for points (lucene/core/.../
    document/XYShape.java newPolygonQuery → the Tessellator edge tests):
    crossing-number point-in-polygon, one vectorized pass per batch.  The
    per-edge test uses only IEEE +,−,×,÷ and compares — bit-identical in
    numpy and DuckDB, so the gate is strict like the rest of the planar
    family."""
    vx = np.array([p[0] for p in POLYGON])
    vy = np.array([p[1] for p in POLYGON])

    def inside(batch: pd.DataFrame) -> pd.DataFrame:
        x, y = _xy(batch["event_id"])
        crossings = np.zeros(x.size, dtype=np.int64)
        for i in range(len(POLYGON)):
            x1, y1 = vx[i], vy[i]
            x2, y2 = vx[(i + 1) % len(POLYGON)], vy[(i + 1) % len(POLYGON)]
            straddles = (y1 > y) != (y2 > y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            crossings += (straddles & (x < xi)).astype(np.int64)
        m = (crossings % 2) == 1
        return pd.DataFrame(
            {"event_id": batch["event_id"].to_numpy(np.int64)[m], "x": x[m], "y": y[m]}
        )

    out = read(sf_dir, "events", ["event_id"]).map_batches(inside, batch_format="pandas")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def _polygon_sql() -> str:
    terms = []
    n = len(POLYGON)
    for i in range(n):
        x1, y1 = POLYGON[i]
        x2, y2 = POLYGON[(i + 1) % n]
        terms.append(
            f"CASE WHEN (({y1} > y) <> ({y2} > y)) AND "
            f"(x < ({x2} - {x1}) * (y - {y1}) / ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


GEO_POLYGON_SQL = f"""
SELECT event_id, x, y FROM ({_XY_SQL})
WHERE ({_polygon_sql()}) % 2 = 1
ORDER BY event_id
"""


PIPELINES: dict[str, Pipeline] = {
    "geo_bbox": Pipeline(geo_bbox, GEO_BBOX_SQL, "planar rectangle containment (XYPointField.newRangeQuery)"),
    "geo_polygon": Pipeline(geo_polygon, GEO_POLYGON_SQL, "point-in-polygon crossing-number filter (XYShape Intersects)"),
    "geo_knn": Pipeline(geo_knn, GEO_KNN_SQL, "planar nearest-neighbour top-k (XYPoint distance sort)"),
    "geo_heatmap": Pipeline(geo_heatmap, GEO_HEATMAP_SQL, "grid-cell count facet (SpatialHeatmapFacets)"),
}
