"""Graph operators over the derived purchase graph: PageRank (integer-exact,
dual broadcast/join plans) and connected components (driver union-find vs
distributed min-label propagation), plus the inter-arrival gap window query."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _pdf(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_purchase_edges_distinct_and_bipartite():
    from entity_resolution_pipeline_ray.pipelines.graph import purchase_edges

    e = purchase_edges(SF).to_pandas()
    assert len(e) == len(e.drop_duplicates(["src", "dst"]))
    assert (e["src"] % 2 == 0).all()  # customers are even-encoded
    assert (e["dst"] % 2 == 1).all()  # suppliers are odd-encoded

    # join plan (threshold 0) emits the identical edge set
    e2 = purchase_edges(SF, broadcast_threshold_rows=0).to_pandas()
    assert _canon(e).equals(_canon(e2))


def test_pagerank_plans_agree_and_conserve_mass():
    from entity_resolution_pipeline_ray.pipelines.graph import (
        SCALE,
        g_pagerank,
        pagerank_on_edges,
        purchase_edges,
    )

    driver = _canon(_pdf(g_pagerank(SF)))  # default: driver fast path
    joined = _canon(_pdf(g_pagerank(SF, broadcast_threshold_rows=0)))
    assert driver.equals(joined)
    # the middle (broadcast streaming-round) plan
    edges = purchase_edges(SF).materialize()
    mid = _canon(_pdf(pagerank_on_edges(edges, driver_edge_threshold=0)))
    assert driver.equals(mid)

    broadcast = driver
    r = broadcast["rank_units"].to_numpy()
    assert (r > 0).all()
    # dropped dangling mass (suppliers have no out-edges) keeps the total
    # strictly under SCALE but the teleport floor keeps it well above 0
    assert 0 < r.sum() <= SCALE
    # suppliers aggregate many customers' mass: the max rank must exceed the
    # uniform start
    assert r.max() > SCALE // len(r)


def test_components_plans_agree_and_are_consistent():
    from entity_resolution_pipeline_ray.pipelines.graph import g_components, purchase_edges

    fast = _canon(_pdf(g_components(SF)))
    dist = _canon(_pdf(g_components(SF, driver_edge_threshold=0)))
    assert fast.equals(dist)

    comp = dict(zip(fast["node"], fast["component"]))
    # every edge's endpoints share a component, and the label is the min id
    e = purchase_edges(SF).to_pandas()
    assert all(comp[s] == comp[d] for s, d in zip(e["src"], e["dst"]))
    labels = fast.groupby("component")["node"].min()
    assert (labels.index == labels.to_numpy()).all()


def test_user_gaps_matches_pandas_reference():
    from entity_resolution_pipeline_ray.pipelines.relational import q_user_gaps

    mine = _canon(_pdf(q_user_gaps(SF)))

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rows = []
    for uid, g in ev.groupby("user_id"):
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = np.diff(us)
        rows.append(
            {
                "user_id": uid,
                "n_events": len(g),
                "n_gaps": len(gaps),
                "total_gap_us": int(gaps.sum()) if len(gaps) else 0,
                "max_gap_us": int(gaps.max()) if len(gaps) else 0,
            }
        )
    ref = _canon(pd.DataFrame(rows))
    assert mine.astype("int64").equals(ref.astype("int64"))


def test_triangles_on_hand_graphs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.graph import triangles_on_edges

    def count(pairs):
        t = pa.table({"u": pa.array([a for a, _ in pairs], type=pa.int64()),
                      "v": pa.array([b for _, b in pairs], type=pa.int64())})
        return triangles_on_edges(rd.from_arrow(t))["n_triangles"][0].as_py()

    # K4 has C(4,3)=4 triangles; a path has none; a pendant edge adds none
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert count(k4) == 4
    assert count([(1, 2), (2, 3), (3, 4)]) == 0
    assert count(k4 + [(4, 9)]) == 4
    # two triangles sharing an edge
    assert count([(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]) == 2


def test_triangles_dual_plans_agree(ray_session, monkeypatch):
    """The broadcast (degree-searchsorted + in-pass closing count) and
    at-scale (two degree joins + ekey hash join) plans must count the same
    triangles."""
    import pyarrow as pa
    import ray.data as rd

    import entity_resolution_pipeline_ray.pipelines.graph as G

    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9), (5, 6)]
    t = pa.table({"u": pa.array([a for a, _ in pairs], type=pa.int64()),
                  "v": pa.array([b for _, b in pairs], type=pa.int64())})
    bcast = G.triangles_on_edges(rd.from_arrow(t))["n_triangles"][0].as_py()
    monkeypatch.setattr(G, "EDGE_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(G, "NODE_BROADCAST_MAX_ROWS", 0)
    joined = G.triangles_on_edges(rd.from_arrow(t))["n_triangles"][0].as_py()
    assert bcast == joined == 4


def test_degree_hist_hand_events(ray_session, tmp_path):
    """Three users sharing one minute form a triangle (deg 2 each); a pair in
    another minute adds two deg-1 nodes."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(["2024-01-01 00:00"] * 3 + ["2024-01-01 00:05"] * 2)
    pq.write_table(
        pa.table({"event_id": pa.array(range(5), type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "user_id": pa.array([1, 2, 3, 8, 9], type=pa.int64()),
                  "event_type": ["view"] * 5, "value": [0.0] * 5, "props": ["{}"] * 5}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.graph import g_degree_hist

    got = g_degree_hist(str(tmp_path)).to_pandas()
    assert dict(zip(got["degree"], got["n_nodes"])) == {1: 2, 2: 3}


def _lpa_reference(pairs, rounds=3):
    """Straight-python synchronous LPA: min label among the most frequent
    neighbor labels, no self vote."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n in nbrs:
            c = Counter(lab[m] for m in nbrs[n])
            top = max(c.values())
            nxt[n] = min(l for l, k in c.items() if k == top)
        lab = nxt
    return lab


def test_lpa_matches_reference_random(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.graph import lpa_on_edges

    rng = np.random.default_rng(21)
    pairs = set()
    while len(pairs) < 120:
        a, b = sorted(rng.integers(1, 40, size=2).tolist())
        if a != b:
            pairs.add((a, b))
    pairs = sorted(pairs)
    t = pa.table({"u": pa.array([a for a, _ in pairs], type=pa.int64()),
                  "v": pa.array([b for _, b in pairs], type=pa.int64())})
    got = lpa_on_edges(rd.from_arrow(t))
    got = {r["node"]: r["community"] for r in got.to_pandas().to_dict("records")}
    assert got == _lpa_reference(pairs)


def test_lpa_dual_plans_agree(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.graph import lpa_on_edges

    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    t = pa.table({"u": pa.array([a for a, _ in pairs], type=pa.int64()),
                  "v": pa.array([b for _, b in pairs], type=pa.int64())})
    fast = lpa_on_edges(rd.from_arrow(t)).to_pandas().sort_values("node").reset_index(drop=True)
    dist = (
        lpa_on_edges(rd.from_arrow(t), driver_edge_threshold=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert fast.equals(dist)
    assert fast.set_index("node")["community"].to_dict() == _lpa_reference(pairs)
