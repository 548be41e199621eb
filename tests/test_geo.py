"""Planar geo pipelines (XYPoint family + heatmap facet): pandas oracle
duels on the derived deterministic coordinates."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _events_xy():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    u = ev["event_id"].to_numpy(np.int64)
    ev["x"] = ((u * 37) % 2000) / 10.0 - 100.0
    ev["y"] = ((u * 101) % 1000) / 10.0 - 50.0
    return ev


def test_bbox_matches_pandas(ray_session):
    from lucene_solr_ray.pipelines.geo import BBOX, geo_bbox

    got = geo_bbox(SF)
    ev = _events_xy()
    x0, x1, y0, y1 = BBOX
    want = ev[(ev.x >= x0) & (ev.x <= x1) & (ev.y >= y0) & (ev.y <= y1)]
    assert got["event_id"].tolist() == sorted(want["event_id"])
    assert (got[["x", "y"]].to_numpy() == want.sort_values("event_id")[["x", "y"]].to_numpy()).all()


def test_knn_matches_pandas(ray_session):
    from lucene_solr_ray.pipelines.geo import KNN_K, Q_X, Q_Y, geo_knn

    got = geo_knn(SF)
    ev = _events_xy()
    d2 = (ev.x - Q_X) ** 2 + (ev.y - Q_Y) ** 2
    want = ev.assign(dist2=d2).sort_values(["dist2", "event_id"]).head(KNN_K)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert (got["dist2"].to_numpy() == want["dist2"].to_numpy()).all()
    assert got["rank"].tolist() == list(range(1, KNN_K + 1))


def test_heatmap_covers_all_events(ray_session):
    from lucene_solr_ray.pipelines.geo import GRID_STEP, geo_heatmap

    got = geo_heatmap(SF)
    ev = _events_xy()
    assert int(got["n"].sum()) == len(ev)
    want = (
        ev.assign(cell_x=np.floor(ev.x / GRID_STEP), cell_y=np.floor(ev.y / GRID_STEP))
        .groupby(["cell_x", "cell_y"], as_index=False)
        .size()
    )
    assert len(got) == len(want)
