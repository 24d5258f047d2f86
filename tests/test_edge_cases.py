"""Degenerate-input edges: empty corpora, all-duplicate corpora, single rows.
The 100-TB posture means partitions WILL occasionally be empty or pathological;
every operator must pass them through rather than crash."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """An sf dir whose documents/embeddings tables have the right schema and
    ZERO rows."""
    d = tmp_path_factory.mktemp("empty_sf")
    docs = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    emb = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
    return str(d)


def test_dedup_ops_on_empty_corpus(empty_sf):
    import entity_resolution_pipeline_ray.pipelines.dedup as D

    assert D.minhash_dup_pairs(empty_sf).count() == 0
    assert D.simhash_dup_pairs(empty_sf).count() == 0
    assert D.ngram_jaccard_dup_pairs(empty_sf).count() == 0
    assert D.embedding_dup_pairs(empty_sf).count() == 0
    assert D.embedding_dup_pairs_lsh(empty_sf).count() == 0
    assert D.dedup_apply_exact(empty_sf).count() == 0


def test_text_ops_on_empty_corpus(empty_sf):
    import entity_resolution_pipeline_ray.pipelines.text_analysis as T

    for fn in [T.t_normalize, T.t_string_hash, T.t_token_count, T.t_quality,
               T.t_quality_full, T.t_lang_id, T.t_simhash, T.t_fingerprint]:
        out = fn(empty_sf)
        assert out.count() == 0, fn.__name__


def test_signatures_on_all_duplicate_corpus():
    """intern='always' on a corpus where EVERY text is identical: one rep,
    full fan-out, identical signatures everywhere."""
    import ray.data as rd

    from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG as cfg
    from entity_resolution_pipeline_ray.stages.signatures import compute_doc_features

    n = 64
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "url": pa.array([f"https://x.test/{i}" for i in range(n)]),
                "title": pa.array(["same title"] * n),
                "domain": pa.array(["x.test"] * n),
                "text": pa.array(["the same body of text repeated verbatim"] * n),
            }
        )
    ).materialize()
    out = compute_doc_features(docs, cfg.minhash, cfg.tfidf, intern="always").to_pandas()
    assert len(out) == n
    sigs = {tuple(np.asarray(s)) for s in out["minhash_sig"]}
    assert len(sigs) == 1  # every doc got the single rep's signature


def test_clustering_on_no_edges():
    import ray.data as rd

    from entity_resolution_pipeline_ray.config import ClusteringConfig
    from entity_resolution_pipeline_ray.stages.clustering import cluster_labels

    edges = rd.from_arrow(
        pa.table({"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64()),
                  "w": pa.array([], type=pa.float32())})
    )
    ids = rd.from_arrow(pa.table({"doc_id": pa.array([7, 8, 9], type=pa.int64())}))
    for algo in ("connected_components", "louvain", "label_propagation"):
        df = cluster_labels(edges, ids, ClusteringConfig(algorithm=algo)).to_pandas()
        assert sorted(df["cluster_id"]) == [7, 8, 9], algo  # all singletons


def test_new_operators_on_empty_tables(ray_session, tmp_path):
    """Session-6 operators short-circuit cleanly on 0-row inputs (the
    ADVICE-class edge: empty frames lose their columns, np.concatenate([])
    raises, pd.concat([]) raises)."""
    import pandas as pd
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "l_suppkey": pa.array([], type=pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    from entity_resolution_pipeline_ray.pipelines.graph import g_components, g_pagerank
    from entity_resolution_pipeline_ray.pipelines.relational import (
        q_funnel,
        q_retention,
        q_user_gaps,
        q_value_histogram,
    )
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_pmi_bigrams, t_source_terms

    sf = str(tmp_path)

    def rows(x):
        return len(x) if isinstance(x, (pa.Table, pd.DataFrame)) else x.count()

    assert rows(g_pagerank(sf)) == 0
    assert rows(g_components(sf)) == 0
    assert rows(q_funnel(sf)) == 0
    assert rows(q_retention(sf)) == 0
    assert rows(q_user_gaps(sf)) == 0
    assert rows(q_value_histogram(sf)) == 0
    assert rows(t_pmi_bigrams(sf)) == 0
    assert rows(t_source_terms(sf)) == 0


def test_pmi_no_bigram_reaches_min_support(ray_session, tmp_path):
    """All-unique bigrams (< PMI_MIN_COUNT occurrences each) must yield an
    empty result, not a KeyError from splitting an empty Series."""
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(4)), type=pa.int64()),
            "text": ["alpha beta", "gamma delta", "epsilon zeta", "eta theta"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": pa.array([10] * 4, type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_pmi_bigrams

    for thresh in (2_000_000, 0):
        out = t_pmi_bigrams(str(tmp_path), driver_merge_threshold=thresh)
        assert len(out) == 0, thresh


def test_gram_partials_trailing_empty_docs():
    """A batch whose LAST doc(s) tokenize to zero tokens must not IndexError
    in the bigram boundary mask (ends == len(grams) for trailing empties)."""
    from entity_resolution_pipeline_ray.pipelines.text_analysis import _gram_count_partials

    t = pa.table({"text": pa.array(["one two three", "four five", "", None], type=pa.string())})
    out = _gram_count_partials(t)
    bi = out.to_pandas()
    grams = set(bi[bi["is_bigram"]]["key"])
    # no cross-doc bigram ("three four"), real adjacents present
    assert "three four" not in grams
    assert {"one two", "two three", "four five"} <= grams
    # empty doc in the middle likewise masks the crossing pair
    t2 = pa.table({"text": pa.array(["a b", None, "c d", ""], type=pa.string())})
    g2 = _gram_count_partials(t2).to_pandas()
    g2 = set(g2[g2["is_bigram"]]["key"])
    assert g2 == {"a b", "c d"}


def test_source_token_partials_null_source():
    """Null source must group under '' (matching the oracle's coalesce), not
    get silently attributed to another source via factorize's -1 code."""
    from entity_resolution_pipeline_ray.pipelines.text_analysis import _source_token_partials

    t = pa.table(
        {
            "source": pa.array(["web", None, "web"], type=pa.string()),
            "text": pa.array(["alpha beta", "gamma", "alpha"], type=pa.string()),
        }
    )
    df = _source_token_partials(t).to_pandas()
    by = {(r.source, r.token): r.n for r in df.itertuples()}
    assert by[("", "gamma")] == 1
    assert by[("web", "alpha")] == 2
    assert ("web", "gamma") not in by


def test_retention_pack_bounds_raise(ray_session, tmp_path):
    """Out-of-range day offsets (pre-1970 ts) must raise, not silently corrupt
    the packed dedup key (same discipline as graph._pack_edges)."""
    import pyarrow.parquet as pq
    import pytest

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], type=pa.int64()),
                "ts": pa.array([np.datetime64("1965-01-01", "us")], type=pa.timestamp("us")),
                "user_id": pa.array([7], type=pa.int64()),
                "event_type": pa.array(["view"], type=pa.string()),
                "value": pa.array([1.0], type=pa.float64()),
                "props": pa.array(["{}"], type=pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from entity_resolution_pipeline_ray.pipelines.relational import q_retention

    with pytest.raises(Exception, match="packing bound"):
        q_retention(str(tmp_path)).to_pandas()


def test_value_histogram_ignores_null_values(ray_session, tmp_path):
    """Null values get NO bucket (oracle: WHERE value IS NOT NULL) instead of
    an arbitrary one from floor(NaN)."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "ts": pa.array([np.datetime64("2024-01-01", "us")] * 4, type=pa.timestamp("us")),
                "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
                "event_type": pa.array(["view"] * 4, type=pa.string()),
                "value": pa.array([0.0, None, 10.0, None], type=pa.float64()),
                "props": pa.array(["{}"] * 4, type=pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from entity_resolution_pipeline_ray.pipelines.relational import q_value_histogram

    out = q_value_histogram(str(tmp_path)).to_pandas()
    total = int(out["n"].sum())
    assert total == 2  # the two non-null values only


def test_dupline_ratio_counts(ray_session, tmp_path):
    """Duplicate-line ratio: repeated lines counted once in distinct; empty
    text yields one empty line (matching DuckDB str_split semantics)."""
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["a\nb\na\na", "x", ""], type=pa.string()),
            "lang": pa.array(["en"] * 3, type=pa.string()),
            "source": pa.array(["s"] * 3, type=pa.string()),
            "n_chars": pa.array([7, 1, 0], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.curation import t_dupline_ratio

    out = t_dupline_ratio(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_lines"] == 4 and out.loc[1, "n_distinct_lines"] == 2
    assert abs(out.loc[1, "dup_line_ratio"] - 0.5) < 1e-9
    assert out.loc[2, "n_lines"] == 1 and out.loc[2, "dup_line_ratio"] == 0.0
    assert out.loc[3, "n_lines"] == 1  # '' splits to one empty line


def test_round4_session_operators_on_empty_tables(ray_session, tmp_path):
    """This session's operators pass 0-row inputs through cleanly."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_quantity": pa.array([], type=pa.float64()),
                "l_extendedprice": pa.array([], type=pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    sf = str(tmp_path)
    from entity_resolution_pipeline_ray.pipelines.graph import g_triangles
    from entity_resolution_pipeline_ray.pipelines.multimodal import m_phash_pairs
    from entity_resolution_pipeline_ray.pipelines.relational import (
        q_corr,
        q_ntile,
        q_pivot_dow,
    )
    from entity_resolution_pipeline_ray.pipelines.sampling import p_split_assign, q_lang_mad
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_tfidf_topk

    assert t_tfidf_topk(sf).count() == 0
    assert q_ntile(sf).count() == 0
    assert g_triangles(sf)["n_triangles"][0].as_py() == 0
    corr = q_corr(sf)
    assert corr["n"][0].as_py() == 0 and corr["r_ppm"][0].as_py() == 0
    assert len(q_pivot_dow(sf)) == 0
    assert m_phash_pairs(sf).num_rows == 0
    assert p_split_assign(sf).count() == 0
    assert len(q_lang_mad(sf)) == 0


def test_late_session_operators_on_empty_tables(ray_session, tmp_path):
    """The late-session operators pass 0-row inputs through cleanly."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_totalprice": pa.array([], type=pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    sf = str(tmp_path)
    from entity_resolution_pipeline_ray.pipelines.dedup import (
        d_minhash_threshold_sweep,
        t_lsh_bucket_stats,
    )
    from entity_resolution_pipeline_ray.pipelines.relational import (
        q_band_join,
        q_dau_wau,
        q_transition_counts,
        q_user_fanout_hist,
        q_user_growth,
    )
    from entity_resolution_pipeline_ray.pipelines.sampling import (
        p_lang_top_quartile,
        p_weighted_sample,
    )
    from entity_resolution_pipeline_ray.pipelines.text_analysis import (
        t_bpe_merges,
        t_csv_reader_agg,
        t_dup_ngram_fraction,
        t_jsonl_reader_agg,
        t_term_search,
        t_vocab_stats,
    )

    def nrows(out):
        import pandas as pd

        return len(out) if isinstance(out, (pa.Table, pd.DataFrame)) else out.count()

    assert nrows(q_band_join(sf)) == 0
    assert nrows(q_dau_wau(sf)) == 0
    assert nrows(q_user_growth(sf)) == 0
    assert nrows(q_transition_counts(sf)) == 0
    assert nrows(q_user_fanout_hist(sf)) == 0
    assert nrows(p_weighted_sample(sf)) == 0
    assert nrows(p_lang_top_quartile(sf)) == 0
    assert nrows(t_dup_ngram_fraction(sf)) == 0
    assert nrows(t_term_search(sf)) == 0
    assert nrows(t_lsh_bucket_stats(sf)) == 0
    assert nrows(t_bpe_merges(sf)) == 0
    vs = t_vocab_stats(sf)
    assert vs["n_tokens"][0].as_py() == 0 and vs["vocab_size"][0].as_py() == 0
    sw = d_minhash_threshold_sweep(sf).to_pandas()
    assert sw["n_pairs"].tolist() == [0, 0, 0, 0, 0]
    assert nrows(t_csv_reader_agg(sf)) == 0
    assert nrows(t_jsonl_reader_agg(sf)) == 0
    from entity_resolution_pipeline_ray.pipelines.sampling import p_write_lang_shards

    assert nrows(p_write_lang_shards(sf)) == 0


def test_collect_table_skips_empty_schema_blocks(ray_session):
    """Hash-shuffle aggregates can emit zero-column empty blocks; collect_table
    must concat around them (regression: g_triangles crashed at sf0.001 when
    the degree aggregate produced such a block)."""
    import ray
    import ray.data as rd

    from entity_resolution_pipeline_ray.rayops import collect_table

    real = pa.table({"node": pa.array([1, 2], type=pa.int64()), "deg": pa.array([3, 4], type=pa.int64())})
    empty_noschema = pa.table({})
    ds = rd.from_arrow_refs([ray.put(empty_noschema), ray.put(real), ray.put(empty_noschema)])
    out = collect_table(ds)
    assert out.column_names == ["node", "deg"]
    assert out.num_rows == 2

    # all-empty: schema-bearing empty block wins over the zero-column ones
    empty_schema = real.slice(0, 0)
    ds2 = rd.from_arrow_refs([ray.put(empty_noschema), ray.put(empty_schema)])
    out2 = collect_table(ds2)
    assert out2.column_names == ["node", "deg"] and out2.num_rows == 0
