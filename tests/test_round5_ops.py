"""Round-5 operator additions: 2-D skyline, weekly snapshot thinning,
exact kNN self-join (kNN graph).  The DuckDB value oracles cover the
end-to-end results (tools/check_oracles.py); these tests pin the kernels'
edge cases — ties, duplicates, multi-chunk splits, week-boundary parity —
that a single generated corpus may not exercise."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _brute_skyline(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """O(n²) NOT EXISTS oracle: dominated iff other >= on both, > on one."""
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        if dom.any():
            keep[i] = False
    return keep


def test_skyline_mask_matches_brute_force():
    from entity_resolution_pipeline_ray.pipelines.sampling import _skyline_mask

    rng = np.random.RandomState(7)
    for trial in range(30):
        n = int(rng.randint(1, 200))
        # small value domains force heavy x-ties, y-ties and exact duplicates
        dom = int(rng.choice([3, 5, 10, 1000]))
        x = rng.randint(0, dom, size=n).astype(np.int64)
        y = rng.randint(0, dom, size=n).astype(np.int64)
        got = _skyline_mask(x, y)
        want = _brute_skyline(x, y)
        assert np.array_equal(got, want), f"trial {trial}: dom={dom} n={n}"


def test_skyline_mask_duplicates_and_empty():
    from entity_resolution_pipeline_ray.pipelines.sampling import _skyline_mask

    # exact duplicates of a frontier point all survive (no strict domination)
    x = np.array([5, 5, 3, 5], dtype=np.int64)
    y = np.array([9, 9, 9, 2], dtype=np.int64)
    assert _skyline_mask(x, y).tolist() == [True, True, False, False]
    assert _skyline_mask(np.empty(0, np.int64), np.empty(0, np.int64)).tolist() == []


def test_skyline_of_skylines_identity():
    """The distributed plan's correctness hinges on: global frontier ⊆ union
    of block frontiers, and skyline(union of block skylines) == skyline(all)."""
    from entity_resolution_pipeline_ray.pipelines.sampling import _skyline_mask

    rng = np.random.RandomState(11)
    x = rng.randint(0, 50, size=500).astype(np.int64)
    y = rng.randint(0, 50, size=500).astype(np.int64)
    want = set(map(tuple, np.column_stack([x, y])[_skyline_mask(x, y)].tolist()))
    parts = []
    for lo in range(0, 500, 37):  # uneven blocks
        bx, by = x[lo : lo + 37], y[lo : lo + 37]
        m = _skyline_mask(bx, by)
        parts.append(np.column_stack([bx[m], by[m]]))
    u = np.concatenate(parts)
    got = set(map(tuple, u[_skyline_mask(u[:, 0], u[:, 1])].tolist()))
    assert got == want


def test_week_truncation_parity_with_duckdb():
    """The int64 Monday-start week formula used by url_snapshot_thinning must
    equal DuckDB date_trunc('week', ts) — including year boundaries."""
    import duckdb

    US_DAY = 86_400_000_000
    rng = np.random.RandomState(3)
    base = 1_704_067_200_000_000  # 2024-01-01 (a Monday)
    # spread over 3 years either side of the base, plus exact boundary points
    ts = np.concatenate(
        [
            base + rng.randint(-3 * 365 * 86_400, 3 * 365 * 86_400, size=3000) * 1_000_000,
            np.array([base, base - 1, base + 6 * US_DAY, base + 7 * US_DAY - 1, base + 7 * US_DAY]),
        ]
    ).astype(np.int64)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS ts_us)", [ts.tolist()])
    want = (
        con.sql(
            "SELECT CAST(epoch_us(date_trunc('week', make_timestamp(ts_us))) AS BIGINT) AS wk FROM t"
        )
        .fetchnumpy()["wk"]
        .astype(np.int64)
    )
    con.close()
    days = ts // US_DAY
    got = (((days + 3) // 7) * 7 - 3) * US_DAY
    assert np.array_equal(got, want)


def test_knn_graph_multichunk_matches_numpy(tmp_path, ray_session):
    """s_knn_graph with chunk_rows small enough to force many (i,j) chunk
    pairs must equal the single-matrix numpy brute force — including exact
    duplicate vectors (cosine ties broken by vec_id asc at the k boundary)."""
    from entity_resolution_pipeline_ray.pipelines.similarity_search import s_knn_graph

    rng = np.random.RandomState(5)
    n, dim, k = 41, 6, 5
    m = rng.randn(n, dim)
    m[10] = m[3]  # exact duplicates -> score-1.0 ties
    m[25] = m[3]
    m[30] = 2.5 * m[7]  # colinear -> cosine tie without byte equality
    ids = np.arange(100, 100 + n, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(list(m.astype(np.float64)), type=pa.list_(pa.float64())),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = (
        s_knn_graph(str(tmp_path), k=k, chunk_rows=7)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    nm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = nm @ nm.T
    rows = []
    for qi in range(n):
        cand = np.array([j for j in range(n) if j != qi])
        order = np.lexsort((ids[cand], -sims[qi][cand]))
        for r, j in enumerate(cand[order[:k]], start=1):
            rows.append((ids[qi], ids[j], r))
    want = np.array(rows, dtype=np.int64)
    assert got.shape[0] == want.shape[0]
    assert np.array_equal(got[["query_id", "vec_id", "rank"]].to_numpy(dtype=np.int64), want)


def test_url_snapshot_thinning_keeps_weekly_history(ray_session):
    """One row per (canon_url, week); the newest ts (url asc tiebreak) wins;
    a url crawled in W distinct weeks keeps exactly W rows (vs 1 for
    url_snapshot_dedup)."""
    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.er import (
        url_snapshot_dedup,
        url_snapshot_thinning,
    )

    US_DAY = 86_400_000_000
    base = 1_704_067_200_000_000  # 2024-01-01, Monday
    rows = [
        # page/1..3: three snapshots of canon 'a.com/page' across two weeks
        ("http://a.com/page/1", base + 1 * US_DAY),
        ("http://a.com/page/2", base + 2 * US_DAY),  # newest of week 0
        ("http://a.com/page/3", base + 8 * US_DAY),  # week 1
        # tie on ts within one week -> url asc wins
        ("http://b.com/x/9", base),
        ("http://b.com/x/10", base),
        # un-versioned url, single row
        ("http://c.com/only", base + 20 * US_DAY),
    ]
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _ in rows], type=pa.string()),
                "warc_ts": pa.array([t for _, t in rows], type=pa.timestamp("us")),
            }
        )
    )
    thin = url_snapshot_thinning(pages).to_pandas().sort_values(["canon_url", "week_us"])
    assert list(thin["url"]) == [
        "http://a.com/page/2",
        "http://a.com/page/3",
        "http://b.com/x/10",
        "http://c.com/only",
    ]
    # weekly thinning strictly refines global dedup: same keys, more history
    dedup = url_snapshot_dedup(pages).to_pandas()
    assert set(dedup["canon_url"]) == set(thin["canon_url"])
    assert len(thin) >= len(dedup)
