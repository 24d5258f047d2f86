"""Distributed min-label propagation tests: known graphs, chains (diameter >
1 round), empty edges, min-cluster-size filter."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from entity_resolution_pipeline_ray.config import ClusteringConfig
from entity_resolution_pipeline_ray.stages.clustering import (
    cluster_sizes,
    edges_from_scores,
    filter_min_cluster_size,
    propagate_labels,
)


def _ids_ds(ids):
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64())}))


def _edges_ds(edges):
    src = [a for a, b in edges]
    dst = [b for a, b in edges]
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "w": pa.array([1.0] * len(edges), type=pa.float32()),
            }
        )
    )


def _clusters(edges, ids, max_rounds=50, driver_edge_threshold=0):
    # driver_edge_threshold=0 forces the DISTRIBUTED min-label path (the
    # at-scale plan) — the driver union-find fast path is covered by
    # test_driver_fast_path_matches_distributed
    out = propagate_labels(
        _edges_ds(edges),
        _ids_ds(ids),
        ClusteringConfig(max_rounds=max_rounds),
        num_partitions=2,
        driver_edge_threshold=driver_edge_threshold,
    )
    df = out.to_pandas()
    return dict(zip(df["doc_id"], df["cluster_id"]))


def test_driver_fast_path_matches_distributed():
    ids = list(range(1, 30))
    edges = [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13), (20, 21), (21, 1)]
    dist = _clusters(edges, ids, driver_edge_threshold=0)
    fast = _clusters(edges, ids, driver_edge_threshold=10**9)
    assert dist == fast


def test_two_components():
    ids = [1, 2, 3, 4, 5, 6, 7]
    edges = [(1, 2), (2, 3), (5, 6)]
    c = _clusters(edges, ids)
    assert c[1] == c[2] == c[3] == 1
    assert c[5] == c[6] == 5
    assert c[4] == 4 and c[7] == 7  # singletons keep own id


def test_chain_diameter():
    # a 10-node path: min label must walk the full diameter
    ids = list(range(10, 110, 10))
    edges = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    c = _clusters(edges, ids)
    assert set(c.values()) == {10}


def test_ring_and_cross_edges():
    ids = [1, 2, 3, 4]
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    c = _clusters(edges, ids)
    assert set(c.values()) == {1}


def test_empty_edges():
    ids = [3, 1, 2]
    c = _clusters([], ids)
    assert c == {3: 3, 1: 1, 2: 2}


def test_edges_from_scores_threshold():
    scores = rd.from_arrow(
        pa.table(
            {
                "left_id": pa.array([1, 2, 3], type=pa.int64()),
                "right_id": pa.array([4, 5, 6], type=pa.int64()),
                "prob": pa.array([0.9, 0.4, 0.7], type=pa.float32()),
                "match": pa.array([True, True, False]),
            }
        )
    )
    e = edges_from_scores(scores, 0.5).to_pandas()
    assert len(e) == 1 and e["src"][0] == 1  # prob>=0.5 AND match


def test_min_cluster_size_filter():
    ids = [1, 2, 3, 9]
    edges = [(1, 2), (2, 3)]
    cl = propagate_labels(_edges_ds(edges), _ids_ds(ids), ClusteringConfig(), num_partitions=2).materialize()
    sizes = cluster_sizes(cl)
    filtered = filter_min_cluster_size(cl, sizes, 2, num_partitions=2).to_pandas()
    assert set(filtered["doc_id"]) == {1, 2, 3}


def _two_cliques_edges():
    """Two 4-cliques {1..4} and {11..14} joined by one weak bridge 4-11."""
    import pyarrow as pa

    import ray.data as rd

    src, dst = [], []
    for grp in ([1, 2, 3, 4], [11, 12, 13, 14]):
        for i, a in enumerate(grp):
            for b in grp[i + 1 :]:
                src.append(a)
                dst.append(b)
    src.append(4)
    dst.append(11)
    w = [0.9] * (len(src) - 1) + [0.55]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, type=pa.int64()), "dst": pa.array(dst, type=pa.int64()),
                  "w": pa.array(w, type=pa.float32())})
    )
    all_ids = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4, 11, 12, 13, 14, 99], type=pa.int64())})
    )
    return edges, all_ids


def test_clustering_algorithm_config_selection():
    """Config-selected algorithms on a known graph: components merge across the
    bridge, louvain and label propagation keep the two cliques separate
    (reference's config-string selection, batch_parallel_classification.py:871-935)."""
    import dataclasses

    from entity_resolution_pipeline_ray.config import ClusteringConfig
    from entity_resolution_pipeline_ray.stages.clustering import cluster_labels

    edges, all_ids = _two_cliques_edges()

    def clusters_of(algorithm):
        cfg = ClusteringConfig(algorithm=algorithm)
        df = cluster_labels(edges, all_ids, cfg).to_pandas().set_index("doc_id")["cluster_id"]
        return df

    cc = clusters_of("connected_components")
    assert cc.loc[[1, 2, 3, 4, 11, 12, 13, 14]].nunique() == 1  # one component
    assert cc.loc[99] == 99  # isolated doc is its own cluster

    for algo in ("louvain", "label_propagation"):
        c = clusters_of(algo)
        assert c.loc[[1, 2, 3, 4]].nunique() == 1, algo
        assert c.loc[[11, 12, 13, 14]].nunique() == 1, algo
        assert c.loc[1] != c.loc[11], algo  # bridge does NOT merge communities
        assert c.loc[99] == 99, algo
        # canonical id = min member id
        assert c.loc[1] == 1 and c.loc[11] == 11, algo

    import pytest

    with pytest.raises(ValueError):
        clusters_of("nope")
