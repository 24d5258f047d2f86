"""Tests for the dedup suite, similarity search, text analysis and multimodal
pipelines over the driver testdata at sf0.001."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_exact_dedup_consistency():
    from entity_resolution_pipeline_ray.pipelines.dedup import dedup_apply_exact
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_exact_dedup

    kept = dedup_apply_exact(SF).to_pandas()
    groups = t_exact_dedup(SF).to_pandas()
    assert len(kept) == len(groups)  # one kept doc per distinct content hash
    assert set(kept["doc_id"]) == set(groups["keep_doc_id"])


def test_minhash_pairs_are_near_duplicates():
    """LSH-candidate pairs that pass the signature-agreement threshold must be
    truly similar (verify a sample with exact shingle Jaccard)."""
    import duckdb

    from entity_resolution_pipeline_ray.functions.text import word_shingles, word_tokens
    from entity_resolution_pipeline_ray.pipelines.dedup import minhash_dup_pairs

    pairs = minhash_dup_pairs(SF, threshold=0.6).to_pandas()
    con = duckdb.connect()
    docs = con.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    con.close()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for _, row in pairs.head(20).iterrows():
        sa = set(word_shingles(word_tokens(texts[row["left_id"]]), 3))
        sb = set(word_shingles(word_tokens(texts[row["right_id"]]), 3))
        j = len(sa & sb) / max(1, len(sa | sb))
        assert j >= 0.4, (row["left_id"], row["right_id"], j)


def test_ngram_jaccard_exact_verification():
    from entity_resolution_pipeline_ray.pipelines.dedup import ngram_jaccard_dup_pairs

    pairs = ngram_jaccard_dup_pairs(SF, threshold=0.5).to_pandas()
    assert (pairs["jaccard"] >= 0.5).all()
    assert (pairs["left_id"] < pairs["right_id"]).all()


def test_simhash_pairs_hamming_bound():
    from entity_resolution_pipeline_ray.pipelines.dedup import simhash_dup_pairs

    pairs = simhash_dup_pairs(SF, max_hamming=8).to_pandas()
    assert (pairs["hamming"] <= 8).all()


def test_embedding_dedup_chunked_matches_duckdb():
    """The chunk-pair block-nested-loop exact plan must equal the all-pairs SQL."""
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.dedup import embedding_dup_pairs

    mine = (
        embedding_dup_pairs(SF, chunk_rows=128)  # force multiple chunks
        .to_pandas()
        .sort_values(["left_vec_id", "right_vec_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    oracle = con.sql(
        f"""SELECT a.vec_id AS left_vec_id, b.vec_id AS right_vec_id
            FROM '{SF}/embeddings.parquet' a, '{SF}/embeddings.parquet' b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3"""
    ).df().sort_values(["left_vec_id", "right_vec_id"]).reset_index(drop=True)
    con.close()
    assert len(mine) == len(oracle)
    assert (mine["left_vec_id"].to_numpy() == oracle["left_vec_id"].to_numpy()).all()
    assert (mine["right_vec_id"].to_numpy() == oracle["right_vec_id"].to_numpy()).all()


def test_embedding_dedup_lsh_recall_and_precision():
    """LSH-bucketed production plan: exact precision (every pair verified),
    recall measured against the exact baseline."""
    from entity_resolution_pipeline_ray.pipelines.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = embedding_dup_pairs(SF).to_pandas()
    approx = embedding_dup_pairs_lsh(SF).to_pandas()
    exact_set = set(zip(exact["left_vec_id"], exact["right_vec_id"]))
    approx_set = set(zip(approx["left_vec_id"], approx["right_vec_id"]))
    assert approx_set <= exact_set  # verified cosine → no false positives
    assert (approx["cosine"] >= 0.3).all()
    if exact_set:
        recall = len(approx_set & exact_set) / len(exact_set)
        # threshold 0.3 is a LOW bar for hyperplane LSH (near-orthogonal pairs
        # collide rarely); multi-probe radius-2 keeps recall usable
        assert recall >= 0.3, recall


def test_knn_bruteforce_matches_duckdb():
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.similarity_search import KNN_BRUTEFORCE_SQL, knn_bruteforce

    mine = knn_bruteforce(SF).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    for t in ["embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = con.sql(KNN_BRUTEFORCE_SQL).df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    con.close()
    assert (mine["vec_id"].to_numpy() == oracle["vec_id"].to_numpy()).all()


def test_knn_lsh_recall_vs_bruteforce():
    from entity_resolution_pipeline_ray.pipelines.similarity_search import knn_bruteforce, knn_lsh

    exact = knn_bruteforce(SF, k=10).to_pandas()
    approx = knn_lsh(SF, k=10).to_pandas()
    # per-query recall of the approximate top-10
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.3  # multi-probe 8-plane LSH on random vectors


def test_media_decode_stub():
    import pyarrow as pa

    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.multimodal import (
        FakeMediaDecoder,
        RealMediaDecoder,
        decode_media,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        # feature-gated real path: constructs and matches the fake's layout
        dec = RealMediaDecoder()
        out_real = dec(
            pa.table(
                {
                    "media_id": pa.array([1], type=pa.int64()),
                    "payload": pa.array([b"notanimage"], type=pa.binary()),
                }
            )
        )
        assert out_real.column_names == ["media_id", "n_bytes", "content_id", "feature"]
    else:
        with pytest.raises(NotImplementedError):
            RealMediaDecoder()
    assert RealMediaDecoder.NEEDS_WARM_STATE  # real codecs take the actor-pool plan

    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2, 3], type=pa.int64()),
                "payload": pa.array([b"\x00\x01\x02", b"", None], type=pa.binary()),
                "mime": ["application/octet-stream"] * 3,
            }
        )
    )
    out = decode_media(media, concurrency=1).to_pandas()
    assert out["n_bytes"].tolist() == [3, 0, 0]
    assert out["feature"].iloc[0].shape == (16,)
    # deterministic content id
    out2 = decode_media(media, concurrency=1).to_pandas()
    assert out["content_id"].tolist() == out2["content_id"].tolist()


def test_lang_id_on_documents():
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_lang_id

    out = t_lang_id(SF).to_pandas()
    assert len(out) == 500
    assert set(out["lang_pred"]) <= {"en", "de", "fr", "es", "und"}


def test_dedup_join_plan_matches_broadcast(monkeypatch):
    """The at-scale join verification plan must produce the same pairs as the
    broadcast plan (forced via BROADCAST_THRESHOLD_ROWS=0)."""
    import entity_resolution_pipeline_ray.pipelines.dedup as D

    def rows(ds):
        df = ds.to_pandas()
        return sorted(map(tuple, df[df.columns[:2]].to_numpy()))

    bcast_mh = rows(D.minhash_dup_pairs(SF, threshold=0.6))
    bcast_sh = rows(D.simhash_dup_pairs(SF, max_hamming=8))
    bcast_lsh = rows(D.embedding_dup_pairs_lsh(SF))
    monkeypatch.setattr(D, "BROADCAST_THRESHOLD_ROWS", 0)
    assert rows(D.minhash_dup_pairs(SF, threshold=0.6)) == bcast_mh
    assert rows(D.simhash_dup_pairs(SF, max_hamming=8)) == bcast_sh
    assert rows(D.embedding_dup_pairs_lsh(SF)) == bcast_lsh


def test_knn_ivf_exhaustive_probe_equals_bruteforce():
    """Probing every cell makes IVF exhaustive — must equal brute force
    exactly (same tie-safe (score desc, vec_id asc) total order)."""
    from entity_resolution_pipeline_ray.pipelines.similarity_search import knn_bruteforce, knn_ivf

    bf = knn_bruteforce(SF).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    ex = knn_ivf(SF, n_probe=16, n_cells=16).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert ex.equals(bf)


def test_knn_ivf_recall_and_oracle():
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.similarity_search import (
        KNN_IVF_SQL,
        knn_bruteforce,
        knn_ivf,
    )

    mine = knn_ivf(SF).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.sql(KNN_IVF_SQL).df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    con.close()
    assert (mine["vec_id"].to_numpy() == oracle["vec_id"].to_numpy()).all()
    # probing 4/16 cells keeps recall well above the scan fraction
    exact = knn_bruteforce(SF, k=10).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(mine[mine["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5


def test_apply_semantic_consistent_with_pairs(monkeypatch):
    """The semantic-dedup apply drops exactly the distinct right ids of the
    single-assignment (multi_probe=False) verified pair set, on BOTH the
    broadcast-flag and the left-outer-join plan."""
    import entity_resolution_pipeline_ray.pipelines.dedup as D

    pairs = D.embedding_dup_pairs_lsh(SF, multi_probe=False).to_pandas()
    expect_drop = set(pairs["right_vec_id"])
    out = D.dedup_apply_semantic(SF).to_pandas()
    n_vecs = len(out)
    assert n_vecs > 0 and out["vec_id"].is_unique
    assert set(out.loc[~out["keep"], "vec_id"]) == expect_drop

    monkeypatch.setattr(D, "BROADCAST_THRESHOLD_ROWS", 0)
    out_join = D.dedup_apply_semantic(SF).to_pandas()
    assert len(out_join) == n_vecs
    assert set(out_join.loc[~out_join["keep"], "vec_id"]) == expect_drop


def test_bm25_topk_matches_duckdb():
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.similarity_search import S_BM25_SQL, s_bm25_topk

    mine = s_bm25_topk(SF).to_pandas().sort_values("rank").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.sql(S_BM25_SQL).df().sort_values("rank").reset_index(drop=True)
    con.close()
    assert len(mine) == 10
    assert (mine["doc_id"].to_numpy() == oracle["doc_id"].to_numpy()).all()
    assert np.allclose(mine["score"], oracle["score"])
    # ranks are 1..k in strictly non-increasing score order
    assert (mine["rank"].to_numpy() == np.arange(1, 11)).all()
    assert (np.diff(mine["score"].to_numpy()) <= 1e-12).all()


def test_value_mad_matches_numpy():
    from entity_resolution_pipeline_ray.pipelines.relational import q_value_mad

    import pandas as pd

    out = q_value_mad(SF).to_pandas()
    vals = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])["value"].to_numpy()
    s = np.sort(vals)
    k = max(int(np.ceil(len(s) / 2)) - 1, 0)
    med = s[k]
    mad = np.sort(np.abs(vals - med))[k]
    assert out["n"].iloc[0] == len(vals)
    assert out["median_value"].iloc[0] == round(float(med), 6)
    assert out["mad"].iloc[0] == round(float(mad), 6)


def test_knn_pq_matches_duckdb_and_recall():
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.similarity_search import KNN_PQ_SQL, knn_pq

    mine = knn_pq(SF).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.sql(KNN_PQ_SQL).df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    con.close()
    # the chain-arithmetic discipline makes engine and SQL bit-identical
    assert (mine["vec_id"].to_numpy() == oracle["vec_id"].to_numpy()).all()
    assert len(mine) == 40 and (mine.groupby("query_id")["rank"].max() == 10).all()

    # quality floor: ADC recall@10 vs exact L2 (4-bit codebooks are coarse —
    # measured 0.30 mean on this corpus; the oracle above is the exactness
    # claim, this pins the approximation from regressing)
    import pandas as pd

    df = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    recalls = []
    for qi in range(4):
        d = ((M - M[qi]) ** 2).sum(axis=1)
        mask = ids != ids[qi]
        top = set(ids[mask][np.lexsort((ids[mask], d[mask]))][:10])
        got = set(mine[mine["query_id"] == ids[qi]]["vec_id"])
        recalls.append(len(top & got) / 10)
    assert np.mean(recalls) >= 0.2


def test_url_snapshot_dedup_matches_pandas():
    """Latest-warc_ts-per-canonical-URL, url-asc tiebreak — pinned against a
    pandas groupby on the same generated shard."""
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.er import url_snapshot_dedup
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, pages_dataset

    spec = PagesSpec(num_pages=600, num_shards=4)
    got = (
        url_snapshot_dedup(pages_dataset(spec))
        .to_pandas()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    raw = pages_dataset(spec).select_columns(["url", "warc_ts"]).to_pandas()
    raw["canon_url"] = raw["url"].str.replace(r"/\d+$", "", regex=True)
    exp = (
        raw.sort_values(["canon_url", "warc_ts", "url"], ascending=[True, False, True])
        .groupby("canon_url")
        .head(1)
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    assert got["url"].tolist() == exp["url"].tolist()
    assert (got["warc_ts"].to_numpy() == exp["warc_ts"].to_numpy()).all()
    # snapshots exist: the dedup must actually drop versioned rows
    assert len(got) < len(raw)


def test_hard_negatives_cross_label_only():
    """Every mined hard negative carries a label different from its query's."""
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.similarity_search import s_hard_negatives

    out = s_hard_negatives(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
    lab = dict(zip(emb["vec_id"], emb["label"]))
    assert len(out) > 0
    assert all(lab[q] != lab[v] for q, v in zip(out["query_id"], out["vec_id"]))
    # and the same-label twin keeps its semantics after the shared-kernel refactor
    from entity_resolution_pipeline_ray.pipelines.similarity_search import knn_filtered

    pos = knn_filtered(SF).to_pandas()
    assert all(lab[q] == lab[v] for q, v in zip(pos["query_id"], pos["vec_id"]))


def test_source_terms_plans_agree_and_are_distinctive():
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_source_terms

    a = t_source_terms(SF).to_pandas()
    b = t_source_terms(SF, driver_merge_threshold=0).to_pandas()
    canon = lambda df: df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    assert canon(a).equals(canon(b))
    # 10 ranked rows per source, log-odds positive at rank 1 (over-represented)
    sizes = a.groupby("source")["rank"].agg(["min", "max", "count"])
    assert (sizes["min"] == 1).all() and (sizes["count"] == sizes["max"]).all()
    assert (a.loc[a["rank"] == 1, "log_odds"] > 0).all()


def test_kmeans_assignment_consistent_with_centroid_geometry():
    """Every vector's assigned cell is its true argmin distance to the final
    centroids; cluster ids cover a bounded range; assignment is total."""
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.similarity_search import (
        _embeddings,
        _fixed_queries,
        _train_kmeans,
        s_kmeans,
    )
    from entity_resolution_pipeline_ray.rayops import list_float_matrix

    out = s_kmeans(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    assert len(out) == len(emb)
    assert out["cid"].between(0, 15).all()

    _, seeds = _fixed_queries(SF, 16)
    cents = _train_kmeans(_embeddings(SF), seeds.astype(np.float64), 2)
    m = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy())
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    ref = np.argmin(d2, axis=1)
    got = out.sort_values("vec_id")["cid"].to_numpy()
    assert (got == ref).all()


def _write_doc_table(tmp_path, rows: dict, source=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    source = source or ["s"] * len(rows)
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()), "lang": ["en"] * len(rows),
         "source": source, "n_chars": [len(v) for v in rows.values()]}
    )
    pq.write_table(t, tmp_path / "documents.parquet")


def test_phash_pairs_header_dups_at_distance_zero(ray_session, tmp_path):
    """The stand-in fingerprint hashes the 32-byte payload header: exact dups
    AND docs sharing a header pair at Hamming 0; everything else is
    > PHASH_MAX_HAMMING apart (md5 bits are ~30/60 for unrelated headers).
    An empty pair set must still present the 3-column schema."""
    shared_header = "X" * 32  # exactly PHASH_HEADER_BYTES
    rows = {1: "alpha beta gamma", 2: "alpha beta gamma", 3: shared_header + " tail one",
            4: "another unrelated document body", 5: "alpha beta gamma",
            6: shared_header + " a different tail"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.multimodal import m_phash_pairs

    got = m_phash_pairs(str(tmp_path)).to_pandas().sort_values(["left_id", "right_id"])
    assert list(map(tuple, got[["left_id", "right_id"]].to_numpy())) == [
        (1, 2), (1, 5), (2, 5), (3, 6)]
    assert (got["hamming"] == 0).all()

    # schema-stable empty: all-distinct headers -> 0 rows, 3 columns
    _write_doc_table(tmp_path, {1: "first unique document text", 2: "second unique body"})
    empty = m_phash_pairs(str(tmp_path)).to_pandas()
    assert len(empty) == 0
    assert sorted(empty.columns) == ["hamming", "left_id", "right_id"]


def test_cluster_size_hist_counts(ray_session, tmp_path):
    # component {1,2,3} + singleton {10} -> one size-3 cluster, one size-1
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(("CHANGED" if i == 30 else f"tok{i}") for i in range(60))
    other = " ".join(f"zzz{i}" for i in range(60))
    _write_doc_table(tmp_path, {1: base, 2: base, 3: near, 10: other})
    from entity_resolution_pipeline_ray.pipelines.dedup import dedup_cluster_size_hist

    got = dedup_cluster_size_hist(str(tmp_path)).to_pandas().set_index("cluster_size")
    assert got.loc[3, "n_clusters"] == 1
    assert got.loc[1, "n_clusters"] == 1


def test_split_assign_deterministic_and_total(ray_session, tmp_path):
    from entity_resolution_pipeline_ray.functions.hashing import md5_u64
    from entity_resolution_pipeline_ray.pipelines.sampling import p_split_assign

    rows = {i: f"doc {i}" for i in range(200)}
    _write_doc_table(tmp_path, rows)
    got = p_split_assign(str(tmp_path)).to_pandas().set_index("doc_id")["split"]
    assert len(got) == 200
    for i in range(200):
        b = md5_u64(str(i)) % 100
        exp = "train" if b < 80 else ("dev" if b < 90 else "test")
        assert got.loc[i] == exp
    # the three splits are all non-empty at n=200
    assert set(got.unique()) == {"train", "dev", "test"}


def test_contamination_by_source_rates(ray_session, tmp_path):
    """doc_id % 20 == 0 is the benchmark split; a corpus doc sharing a 5-gram
    with it is flagged and counted under its source."""
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    clean = "completely unrelated words strung together for filler content here"
    rows = {0: bench_text,                       # benchmark doc (excluded from corpus)
            1: "prefix words " + bench_text,     # contaminated (shares 5-grams)
            2: clean, 3: clean + " extra"}
    _write_doc_table(tmp_path, rows, source=["s0", "s0", "s1", "s1"])
    from entity_resolution_pipeline_ray.pipelines.curation import d_contamination_by_source

    got = d_contamination_by_source(str(tmp_path)).to_pandas().set_index("source")
    assert got.loc["s0", "n_docs"] == 1 and got.loc["s0", "n_flagged"] == 1
    assert got.loc["s0", "rate_ppm"] == 1_000_000
    assert got.loc["s1", "n_docs"] == 2 and got.loc["s1", "n_flagged"] == 0
    assert got.loc["s1", "rate_ppm"] == 0


def test_rollup_levels_consistent(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {"doc_id": [1, 2, 3, 4], "text": ["a", "bb", "ccc", "dddd"],
         "lang": ["en", "de", "en", "en"], "source": ["s0", "s0", "s1", "s1"],
         "n_chars": [1, 2, 3, 4]}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_rollup

    got = q_rollup(str(tmp_path)).set_index(["source", "lang"])
    assert got.loc[("s0", "en"), "n_docs"] == 1
    assert got.loc[("s0", "<all>"), "sum_chars"] == 3
    assert got.loc[("s1", "<all>"), "n_docs"] == 2
    assert got.loc[("<all>", "<all>"), "sum_chars"] == 10
    assert got.loc[("<all>", "<all>"), "n_docs"] == 4


def test_lsh_recall_audits_against_bruteforce(ray_session):
    """recall_bp is exactly |lsh topk ∩ bf topk| / k per query, in [0, 10000]."""
    sf = "/root/testdata/sf0.001"
    from entity_resolution_pipeline_ray.pipelines.similarity_search import (
        knn_bruteforce, knn_lsh, s_lsh_recall)

    got = s_lsh_recall(sf).to_pandas().set_index("query_id")
    bf = knn_bruteforce(sf).to_pandas()
    ap = knn_lsh(sf).to_pandas()
    for qid, g in bf.groupby("query_id"):
        hits = len(set(g["vec_id"]) & set(ap[ap["query_id"] == qid]["vec_id"]))
        assert got.loc[qid, "n_hits"] == hits
        assert got.loc[qid, "recall_bp"] == hits * 10_000 // 10
    assert got["recall_bp"].between(0, 10_000).all()


def test_tfidf_topk_hand_check(ray_session, tmp_path):
    """Fixed-point tf-idf ranks rarer terms above common ones; tf scales."""
    import numpy as np

    rows = {1: "apple banana apple", 2: "banana cherry", 3: "apple cherry cherry date"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.text_analysis import TFIDF_FP, t_tfidf_topk

    got = t_tfidf_topk(str(tmp_path)).to_pandas()
    n = 3
    dfreq = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}
    tf = {1: {"apple": 2, "banana": 1}, 2: {"banana": 1, "cherry": 1},
          3: {"apple": 1, "cherry": 2, "date": 1}}
    for doc, terms in tf.items():
        scores = sorted(
            ((t_ * int(np.floor(np.log(n / dfreq[tok]) * TFIDF_FP)), tok) for tok, t_ in terms.items()),
            key=lambda x: (-x[0], x[1]))
        sub = got[got["doc_id"] == doc].sort_values("rank")
        assert list(sub["tok"]) == [tok for _, tok in scores[:3]]
        assert list(sub["score_fp"]) == [s for s, _ in scores[:3]]


def test_ntile_uneven_bucket_sizes(ray_session, tmp_path):
    """n=7, k=4 -> bucket sizes 2,2,2,1 in (n_chars, doc_id) order (DuckDB
    ntile semantics: first n%k buckets get the extra row)."""
    rows = {i: "x" * (10 + i) for i in range(1, 8)}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.relational import q_ntile

    got = q_ntile(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(got["tile"]) == [1, 1, 2, 2, 3, 3, 4]


def test_rollup_events_levels_consistent(ray_session):
    from entity_resolution_pipeline_ray.pipelines.relational import q_rollup_events

    got = q_rollup_events("/root/testdata/sf0.001").to_pandas()
    leaf = got[(got["event_type"] != "(all)") & (got["hour"] != pd.Timestamp("1970-01-01"))]
    per_type = got[(got["event_type"] != "(all)") & (got["hour"] == pd.Timestamp("1970-01-01"))]
    total = got[got["event_type"] == "(all)"]
    assert len(total) == 1
    assert leaf["n_events"].sum() == total["n_events"].iloc[0]
    assert per_type["n_events"].sum() == total["n_events"].iloc[0]


def test_corr_perfect_and_anti(ray_session, tmp_path):
    """Planted perfectly-correlated / anti-correlated lineitems hit ±1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_resolution_pipeline_ray.pipelines.relational import q_corr

    def write(qty, price):
        pq.write_table(
            pa.table({"l_quantity": pa.array(qty, type=pa.float64()),
                      "l_extendedprice": pa.array(price, type=pa.float64())}),
            tmp_path / "lineitem.parquet")

    write([1, 2, 3, 4], [10.0, 20.0, 30.0, 40.0])
    assert q_corr(str(tmp_path))["r_ppm"][0].as_py() == 1_000_000
    write([1, 2, 3, 4], [40.0, 30.0, 20.0, 10.0])
    assert q_corr(str(tmp_path))["r_ppm"][0].as_py() == -1_000_000


def test_minhash_accuracy_bounds(ray_session):
    """Every audited pair: estimate numerator in [0,128], true jaccard in
    [0,1e6], and the estimate is within sketch-noise distance of truth
    (128 perms -> s.e. <= ~0.045; allow 4 sigma)."""
    from entity_resolution_pipeline_ray.pipelines.dedup import d_minhash_accuracy

    got = d_minhash_accuracy("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    assert got["est_x128"].between(0, 128).all()
    assert got["true_ppm"].between(0, 1_000_000).all()
    assert (got["abs_err_ppm"] <= 180_000).all()


def test_lsh_bucket_stats_totals(ray_session, tmp_path):
    """Histogram mass equals docs x bands: every non-empty doc emits exactly
    num_bands (=32) keys, so sum(bucket_size * n_buckets) == 4 * 32."""
    rows = {1: "alpha beta gamma delta", 2: "alpha beta gamma delta",
            3: "totally different words here", 4: "another unrelated body of text"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.config import MinHashConfig
    from entity_resolution_pipeline_ray.pipelines.dedup import t_lsh_bucket_stats

    nb = MinHashConfig().num_bands
    got = t_lsh_bucket_stats(str(tmp_path)).to_pandas()
    assert (got["bucket_size"] * got["n_buckets"]).sum() == 4 * nb
    # the two identical docs share all nb buckets -> at least nb size-2 buckets
    assert got.set_index("bucket_size").loc[2, "n_buckets"] >= nb


def test_dau_wau_hand_events(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-01-01 05:00", "2024-01-01 06:00", "2024-01-02 05:00", "2024-01-09 05:00"])
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "user_id": pa.array([10, 20, 10, 30], type=pa.int64()),
                  "event_type": ["view"] * 4, "value": [0.0] * 4, "props": ["{}"] * 4}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_dau_wau

    got = q_dau_wau(str(tmp_path)).to_pandas()
    got["day"] = pd.to_datetime(got["day_us"], unit="us").dt.date.astype(str)
    g = got.set_index("day")
    assert g.loc["2024-01-01", "dau"] == 2 and g.loc["2024-01-01", "wau"] == 2
    assert g.loc["2024-01-02", "dau"] == 1 and g.loc["2024-01-02", "wau"] == 2
    # Jan 9's trailing week (Jan 3-9) contains only user 30
    assert g.loc["2024-01-09", "dau"] == 1 and g.loc["2024-01-09", "wau"] == 1


def test_band_join_hand_orders(ray_session, tmp_path):
    """Known ±$100 neighborhoods, including cross-bucket (halo) pairs:
    25000c sits in bucket 2 and must still see 19999c (bucket 1) and
    30001c (bucket 3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    prices = [100.00, 150.00, 199.99, 250.00, 300.01, 1000.00]
    pq.write_table(
        pa.table({"o_orderkey": pa.array(range(1, 7), type=pa.int64()),
                  "o_totalprice": pa.array(prices, type=pa.float64())}),
        tmp_path / "orders.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_band_join

    got = q_band_join(str(tmp_path)).to_pandas().set_index("o_orderkey")["n_close"]
    assert got.to_dict() == {1: 2, 2: 3, 3: 3, 4: 3, 5: 1, 6: 0}


def test_weighted_sample_priority_order(ray_session, tmp_path):
    """The sample is exactly the k smallest md5(doc_id)/weight priorities,
    recomputed independently with hashlib here."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, chars = [11, 22, 33, 44, 55], [10, 10_000, 500, 1, 80_000]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": [""] * 5, "lang": ["en"] * 5, "source": ["s"] * 5,
                  "n_chars": pa.array(chars, type=pa.int64())}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_weighted_sample

    def prio(i, w):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
        return float(h) / float(max(w, 1))

    expected = sorted(((prio(i, w), i, max(w, 1)) for i, w in zip(ids, chars)))[:3]
    got = p_weighted_sample(str(tmp_path), k=3).to_pandas()
    assert list(got["doc_id"]) == [e[1] for e in expected]
    assert list(got["weight"]) == [e[2] for e in expected]
    assert list(got["priority"]) == [e[0] for e in expected]


def test_vocab_stats_hand_corpus(ray_session, tmp_path):
    rows = {1: "alpha beta alpha", 2: "beta gamma"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_vocab_stats

    got = t_vocab_stats(str(tmp_path)).to_pandas().iloc[0]
    assert got["n_tokens"] == 5  # alpha x2, beta x2, gamma x1
    assert got["vocab_size"] == 3
    assert got["n_hapax"] == 1


def test_dup_ngram_fraction_hand_corpus(ray_session, tmp_path):
    """Two 9-token docs sharing their first 8-gram -> each has 2 distinct
    8-grams, 1 duplicated (500000 ppm); a short doc emits nothing."""
    rows = {1: "a b c d e f g h x", 2: "a b c d e f g h y", 3: "too short"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_dup_ngram_fraction

    got = t_dup_ngram_fraction(str(tmp_path)).to_pandas().set_index("doc_id")
    assert sorted(got.index) == [1, 2]  # doc 3 has < 8 tokens
    for d in (1, 2):
        assert got.loc[d, "n_grams"] == 2
        assert got.loc[d, "n_dup"] == 1
        assert got.loc[d, "dup_ppm"] == 500_000


def test_bpe_merges_hand_corpus(ray_session, tmp_path):
    """Sennrich's classic example: {low:3, lower:1, lowest:1}.  Pair counts
    round 1: (l,o)=5, (o,w)=5, rest <=2 -> tie broken lexicographically to
    (l,o); round 2 merges (lo,w); round 3 merges (low,e) with count 2."""
    rows = {1: "low low low", 2: "lower lowest"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_bpe_merges

    got = t_bpe_merges(str(tmp_path), n_merges=3).to_pandas()
    assert list(map(tuple, got[["left", "right", "pair_count"]].itertuples(index=False))) == [
        ("l", "o", 5), ("lo", "w", 5), ("low", "e", 2)]


def test_user_growth_hand_events(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-01-01 05:00", "2024-01-01 06:00", "2024-01-02 05:00", "2024-01-03 05:00"])
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "user_id": pa.array([10, 20, 10, 30], type=pa.int64()),
                  "event_type": ["view"] * 4, "value": [0.0] * 4, "props": ["{}"] * 4}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_user_growth

    got = q_user_growth(str(tmp_path)).to_pandas()
    # Jan 1: users 10+20 new (cum 2); Jan 2: none (day absent); Jan 3: user 30
    assert got["new_users"].tolist() == [2, 1]
    assert got["cum_users"].tolist() == [2, 3]


def test_transition_counts_hand_events(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(["2024-01-01 05:00", "2024-01-01 06:00", "2024-01-01 07:00",
                         "2024-01-01 05:30", "2024-01-01 05:45"])
    pq.write_table(
        pa.table({"event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "user_id": pa.array([10, 10, 10, 20, 20], type=pa.int64()),
                  "event_type": ["view", "click", "view", "view", "buy"],
                  "value": [0.0] * 5, "props": ["{}"] * 5}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_transition_counts

    got = q_transition_counts(str(tmp_path)).to_pandas()
    m = {(r["prev_type"], r["event_type"]): r["n_trans"] for _, r in got.iterrows()}
    # user 10: view->click, click->view; user 20: view->buy
    assert m == {("view", "click"): 1, ("click", "view"): 1, ("view", "buy"): 1}


def test_user_fanout_hist_hand_events(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(["2024-01-01"] * 6)
    pq.write_table(
        pa.table({"event_id": pa.array(range(1, 7), type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
                  "event_type": ["view"] * 6, "value": [0.0] * 6, "props": ["{}"] * 6}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_user_fanout_hist

    got = q_user_fanout_hist(str(tmp_path)).to_pandas()
    # user 1 -> 3 events, user 2 -> 2, user 3 -> 1
    assert dict(zip(got["n_events"], got["n_users"])) == {1: 1, 2: 1, 3: 1}


def test_band_join_matches_bruteforce_random(ray_session, tmp_path):
    """Halo-bucket plan == O(n^2) brute force on seeded random prices,
    including exact ±eps boundary hits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    # cluster prices tightly so bands overlap heavily and cross buckets
    prices = np.round(rng.uniform(50, 450, size=300), 2)
    prices[:5] = [100.00, 200.00, 300.00, 199.99, 299.99]  # force boundary pairs
    pq.write_table(
        pa.table({"o_orderkey": pa.array(range(300), type=pa.int64()),
                  "o_totalprice": pa.array(prices, type=pa.float64())}),
        tmp_path / "orders.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_band_join

    got = q_band_join(str(tmp_path)).to_pandas().set_index("o_orderkey")["n_close"].sort_index()
    cents = np.round(prices * 100.0).astype(np.int64)
    brute = (np.abs(cents[:, None] - cents[None, :]) <= 10_000).sum(axis=1) - 1
    assert (got.to_numpy() == brute).all()


def test_dup_ngram_matches_bruteforce_random(ray_session, tmp_path):
    """Two-sort plan == brute-force distinct-8-gram df computation on a
    seeded random corpus with planted shared spans."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(vocab[:10])  # a 10-token span planted in several docs
    rows = {}
    for d in range(40):
        body = " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        rows[d] = (shared + " " + body) if d % 3 == 0 else body
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.functions.text import word_shingles, word_tokens
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_dup_ngram_fraction

    got = t_dup_ngram_fraction(str(tmp_path)).to_pandas().set_index("doc_id")
    # short="drop" semantics: docs under 8 tokens emit no grams
    grams = {
        d: set(word_shingles(word_tokens(txt), 8)) if len(word_tokens(txt)) >= 8 else set()
        for d, txt in rows.items()
    }
    from collections import Counter
    df = Counter(g for gs in grams.values() for g in gs)
    for d, gs in grams.items():
        if not gs:
            assert d not in got.index
            continue
        ndup = sum(1 for g in gs if df[g] >= 2)
        assert got.loc[d, "n_grams"] == len(gs)
        assert got.loc[d, "n_dup"] == ndup
        assert got.loc[d, "dup_ppm"] == ndup * 1_000_000 // len(gs)


def test_weighted_sample_matches_bruteforce_random(ray_session, tmp_path):
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    n = 80
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    chars = rng.integers(0, 5_000, size=n).astype(np.int64)  # includes 0-weight docs
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "text": [""] * n, "lang": ["en"] * n,
                  "source": ["s"] * n, "n_chars": pa.array(chars)}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_weighted_sample

    def prio(i, w):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
        return float(h) / float(max(int(w), 1))

    expected = sorted(((prio(i, w), int(i)) for i, w in zip(ids, chars)))[:20]
    got = p_weighted_sample(str(tmp_path), k=20).to_pandas()
    assert list(got["doc_id"]) == [e[1] for e in expected]
    assert list(got["priority"]) == [e[0] for e in expected]


def test_lang_top_quartile_hand_corpus(ray_session, tmp_path):
    """12 en-docs with n_chars 1..12: quantile_disc(0.75) = element at
    ceil(12*0.75)-1 = index 8 of the sorted list = 9 -> keep 9..12."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 12
    pq.write_table(
        pa.table({"doc_id": pa.array(range(1, n + 1), type=pa.int64()),
                  "text": ["x"] * n, "lang": ["en"] * n, "source": ["s"] * n,
                  "n_chars": pa.array(range(1, n + 1), type=pa.int64())}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_lang_top_quartile

    got = p_lang_top_quartile(str(tmp_path)).to_pandas()
    assert sorted(got["n_chars"]) == [9, 10, 11, 12]


def test_term_search_hand_corpus(ray_session, tmp_path):
    rows = {1: "a Table of data", 2: "no hits here", 3: "sample the sample"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_term_search

    got = t_term_search(str(tmp_path)).to_pandas()
    m = {(r["term"], r["doc_id"]): r["first_pos"] for _, r in got.iterrows()}
    assert m == {("table", 1): 3, ("sample", 3): 1}  # 1-based, case-folded


def test_minhash_threshold_sweep_monotone(ray_session, tmp_path):
    """Counts are monotone non-increasing in the threshold, include zero rows,
    and the 60%-cutoff count equals the registered pair query's count."""
    rows = {1: "alpha beta gamma delta epsilon zeta", 2: "alpha beta gamma delta epsilon zeta",
            3: "alpha beta gamma delta epsilon eta", 4: "totally different content here now"}
    _write_doc_table(tmp_path, rows)
    from entity_resolution_pipeline_ray.pipelines.dedup import (
        d_minhash_threshold_sweep,
        minhash_dup_pairs,
    )

    got = d_minhash_threshold_sweep(str(tmp_path)).to_pandas().set_index("threshold_pct")["n_pairs"]
    assert list(got.index) == [50, 60, 70, 80, 90]
    assert (got.to_numpy()[:-1] >= got.to_numpy()[1:]).all()
    n60 = len(minhash_dup_pairs(str(tmp_path), threshold=0.6).to_pandas())
    assert got.loc[60] == n60


def test_reader_roundtrip_aggs_match_parquet(ray_session):
    """CSV and JSONL reader branches reproduce the parquet-derived aggregate
    exactly (lossless roundtrip of int64 + string columns)."""
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.text_analysis import (
        t_csv_reader_agg,
        t_jsonl_reader_agg,
    )

    con = duckdb.connect()
    want = con.sql(
        f"SELECT lang, count(*) AS n, sum(n_chars) AS s FROM '{SF}/documents.parquet' GROUP BY lang ORDER BY lang"
    ).df()
    con.close()
    for fn in (t_csv_reader_agg, t_jsonl_reader_agg):
        got = fn(SF).to_pandas().sort_values("lang").reset_index(drop=True)
        assert got["n_docs"].tolist() == want["n"].tolist()
        assert got["sum_chars"].tolist() == want["s"].tolist()


def test_write_lang_shards_partition_layout(ray_session):
    """The sink writes ONE hive directory per lang (the resumable layout) and
    the read-back aggregate matches the source."""
    import glob
    import hashlib
    import os

    import duckdb

    from entity_resolution_pipeline_ray.pipelines.sampling import p_write_lang_shards

    got = p_write_lang_shards(SF).to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(
        f"SELECT lang, count(*) AS n FROM '{SF}/documents.parquet' GROUP BY lang ORDER BY lang"
    ).df()
    con.close()
    assert got["n_docs"].tolist() == want["n"].tolist()
    d = f"/tmp/lang_shards_{hashlib.md5(SF.encode()).hexdigest()[:12]}"
    parts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(d, "lang=*")))
    assert parts == sorted(f"lang={l}" for l in want["lang"])


def test_rate_anomaly_hand_events(ray_session, tmp_path):
    """A flat 1-event/minute stream with one 50-event spike: only the spike
    minute trips the 3-sigma rule; the flat prefix never does (sigma=0 but
    x == mu there)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01")
    ts, uid = [], []
    for m in range(30):
        ts.append(base + pd.Timedelta(minutes=m)); uid.append(1)
    spike = base + pd.Timedelta(minutes=30)
    for i in range(50):
        ts.append(spike); uid.append(i)
    pq.write_table(
        pa.table({"event_id": pa.array(range(len(ts)), type=pa.int64()),
                  "ts": pa.array(pd.to_datetime(ts), type=pa.timestamp("us")),
                  "user_id": pa.array(uid, type=pa.int64()),
                  "event_type": ["view"] * len(ts), "value": [0.0] * len(ts),
                  "props": ["{}"] * len(ts)}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_rate_anomaly

    got = q_rate_anomaly(str(tmp_path)).to_pandas()
    assert got["anomaly"].sum() == 1
    assert got.loc[got["anomaly"] == 1, "n_events"].iloc[0] == 50


def test_fuzzy_name_pairs_hand_parts(ray_session, tmp_path):
    """Engineered near-names incl. a cross-length-bucket pair (len 10 vs 12,
    dist 2) and a same-name different-brand pair that must NOT match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = ["steel blue", "steel blues", "steel bluesy", "green metal", "steel blue"]
    brands = ["B1", "B1", "B1", "B1", "B2"]
    pq.write_table(
        pa.table({"p_partkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "p_name": names, "p_brand": brands,
                  "p_type": ["t"] * 5, "p_size": pa.array([1] * 5, type=pa.int32()),
                  "p_retailprice": [1.0] * 5}),
        tmp_path / "part.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_fuzzy_name_pairs

    got = q_fuzzy_name_pairs(str(tmp_path)).to_pandas()
    pairs = {(r["left_partkey"], r["right_partkey"]): r["lev_dist"] for _, r in got.iterrows()}
    # (1,2) dist 1; (2,3) dist 1; (1,3) dist 2 crosses buckets 5 and 6
    assert pairs == {(1, 2): 1, (2, 3): 1, (1, 3): 2}


def _write_random_events(tmp_path, n=400, n_users=25, days=20, seed=5):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    ts_us = base + rng.integers(0, days * 86_400_000_000, size=n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(np.sort(ts_us) * 1000)).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, n_users + 1, size=n).astype(np.int64)),
        "event_type": pa.array(rng.choice(["view", "click", "buy"], size=n)),
        "value": pa.array(np.zeros(n)), "props": pa.array(["{}"] * n)})
    pq.write_table(tbl, tmp_path / "events.parquet")
    return tbl.to_pandas()


def test_dau_wau_matches_bruteforce_random(ray_session, tmp_path):
    ev = _write_random_events(tmp_path)
    from entity_resolution_pipeline_ray.pipelines.relational import q_dau_wau

    got = q_dau_wau(str(tmp_path)).to_pandas().set_index("day_us")
    ev["day"] = ev["ts"].dt.floor("D")
    for day, g in ev.groupby("day"):
        key = day.value // 1000
        win = ev[(ev["day"] >= day - pd.Timedelta(days=6)) & (ev["day"] <= day)]
        assert got.loc[key, "dau"] == g["user_id"].nunique()
        assert got.loc[key, "wau"] == win["user_id"].nunique()


def test_user_growth_matches_bruteforce_random(ray_session, tmp_path):
    ev = _write_random_events(tmp_path, seed=6)
    from entity_resolution_pipeline_ray.pipelines.relational import q_user_growth

    got = q_user_growth(str(tmp_path)).to_pandas()
    first = ev.assign(day=ev["ts"].dt.floor("D")).groupby("user_id")["day"].min()
    nd = first.value_counts().sort_index()
    assert got["day_us"].tolist() == [d.value // 1000 for d in nd.index]
    assert got["new_users"].tolist() == nd.tolist()
    assert got["cum_users"].tolist() == nd.cumsum().tolist()


def test_transition_counts_matches_bruteforce_random(ray_session, tmp_path):
    ev = _write_random_events(tmp_path, seed=7)
    from entity_resolution_pipeline_ray.pipelines.relational import q_transition_counts

    got = q_transition_counts(str(tmp_path)).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    prev = ev.groupby("user_id")["event_type"].shift(1)
    sub = pd.DataFrame({"p": prev, "c": ev["event_type"]}).dropna()
    want = sub.groupby(["p", "c"]).size()
    m = {(r["prev_type"], r["event_type"]): r["n_trans"] for _, r in got.iterrows()}
    assert m == {k: int(v) for k, v in want.items()}


def test_curriculum_order_hand_corpus(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": ["x"] * 4, "lang": ["en"] * 4, "source": ["s"] * 4,
                  "n_chars": pa.array([10, 99, 10, 5], type=pa.int64())}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_curriculum_order

    got = p_curriculum_order(str(tmp_path)).to_pandas().set_index("doc_id")["curriculum_rank"]
    # 99 first, then the two 10s by doc_id, then 5
    assert got.to_dict() == {2: 1, 1: 2, 3: 3, 4: 4}


def test_q3_matches_duckdb(ray_session):
    import duckdb

    from entity_resolution_pipeline_ray.pipelines.relational import Q3_SQL, q3_shipping_priority

    mine = q3_shipping_priority(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.sql(Q3_SQL).df()
    con.close()
    assert mine["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert mine["revenue"].tolist() == want["revenue"].tolist()


def test_q3_dual_plans_agree(ray_session):
    """Broadcast segment-filter and semi-join plans return identical top-k."""
    from entity_resolution_pipeline_ray.pipelines.relational import q3_shipping_priority

    bcast = q3_shipping_priority(SF).to_pandas()
    joined = q3_shipping_priority(SF, cust_broadcast_max=0).to_pandas()
    assert bcast.equals(joined)


def test_group_sample_k_hand_corpus(ray_session, tmp_path):
    """Keeps exactly the k smallest-md5 docs per lang, recomputed here."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = list(range(1, 13))
    langs = ["en"] * 8 + ["de"] * 4
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": ["x"] * 12, "lang": langs, "source": ["s"] * 12,
                  "n_chars": pa.array([1] * 12, type=pa.int64())}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_group_sample_k

    got = p_group_sample_k(str(tmp_path), k=3).to_pandas()

    def h(i):
        return int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little") >> 1

    for lang in ("en", "de"):
        members = [i for i, l in zip(ids, langs) if l == lang]
        want = sorted(members, key=lambda i: (h(i), i))[:3]
        assert sorted(got.loc[got["lang"] == lang, "doc_id"]) == sorted(want)


def test_percent_rank_hand_orders(ray_session, tmp_path):
    """RANK ties share the low rank; ppm denominators are n-1 per class."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    prices = [10.0, 20.0, 20.0, 30.0, 5.0]  # class A: ranks 2,3,3,5 over n=4... recompute below
    prios = ["A", "A", "A", "A", "B"]
    pq.write_table(
        pa.table({"o_orderkey": pa.array(range(1, 6), type=pa.int64()),
                  "o_custkey": pa.array([1] * 5, type=pa.int64()),
                  "o_orderstatus": ["O"] * 5, "o_totalprice": prices,
                  "o_orderdate": pa.array(pd.to_datetime(["2024-01-01"] * 5), type=pa.timestamp("us")),
                  "o_orderpriority": prios}),
        tmp_path / "orders.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_percent_rank

    got = q_percent_rank(str(tmp_path)).to_pandas().set_index("o_orderkey")["pr_ppm"]
    # class A (n=4): 10->rank1, 20->rank2 (both), 30->rank4
    assert got.loc[1] == 0
    assert got.loc[2] == got.loc[3] == (2 - 1) * 1_000_000 // 3
    assert got.loc[4] == 1_000_000
    # class B: single row -> denominator clamps to 1, rank 1 -> 0
    assert got.loc[5] == 0


def test_cube_mass_conservation(ray_session):
    """Each grouping set's n_events sums to the corpus total; the grand-total
    row equals the fine-grain sum."""
    from entity_resolution_pipeline_ray.pipelines.relational import q_cube

    got = q_cube(SF).to_pandas()
    fine = got[(got["event_type"] != "(all)") & (got["dow"] >= 0)]
    by_type = got[(got["event_type"] != "(all)") & (got["dow"] == -1)]
    by_dow = got[(got["event_type"] == "(all)") & (got["dow"] >= 0)]
    total = got[(got["event_type"] == "(all)") & (got["dow"] == -1)]
    n = fine["n_events"].sum()
    assert by_type["n_events"].sum() == n
    assert by_dow["n_events"].sum() == n
    assert total["n_events"].iloc[0] == n and len(total) == 1


def test_late_orders_hand_case(ray_session, tmp_path):
    """Correlated EXISTS: only orders in the window with a line shipped >30
    days after the order date count; multiple late lines count the order once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    od = pd.to_datetime(["1994-02-01", "1994-03-01", "1994-04-01", "1993-01-01"])
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "o_custkey": pa.array([1] * 4, type=pa.int64()),
                  "o_orderstatus": ["O"] * 4, "o_totalprice": [1.0] * 4,
                  "o_orderdate": pa.array(od, type=pa.timestamp("us")),
                  "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "1-URGENT"]}),
        tmp_path / "orders.parquet")
    # order 1: two late lines (counts once); order 2: on-time only; order 3:
    # late; order 4: late but outside the window
    li_ok = [1, 1, 2, 3, 4]
    ship = pd.to_datetime(["1994-03-15", "1994-04-01", "1994-03-05", "1994-06-01", "1993-06-01"])
    pq.write_table(
        pa.table({"l_orderkey": pa.array(li_ok, type=pa.int64()),
                  "l_shipdate": pa.array(ship, type=pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_late_orders

    got = q_late_orders(str(tmp_path)).to_pandas().set_index("o_orderpriority")["late_orders"]
    assert got.to_dict() == {"1-URGENT": 1, "2-HIGH": 1}


def test_late_orders_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                  "o_custkey": pa.array([], type=pa.int64()),
                  "o_orderstatus": pa.array([], type=pa.string()),
                  "o_totalprice": pa.array([], type=pa.float64()),
                  "o_orderdate": pa.array([], type=pa.timestamp("us")),
                  "o_orderpriority": pa.array([], type=pa.string())}),
        tmp_path / "orders.parquet")
    pq.write_table(
        pa.table({"l_orderkey": pa.array([], type=pa.int64()),
                  "l_shipdate": pa.array([], type=pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_late_orders

    out = q_late_orders(str(tmp_path)).to_pandas()
    assert list(out.columns) == ["o_orderpriority", "late_orders"] and out.empty


def test_intersect_users_hand_case(ray_session, tmp_path):
    """Only users seen BOTH before 01-01 06:00 and after 01-30 18:00 survive;
    mid-corpus activity neither qualifies nor disqualifies."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime([
        "2024-01-01 01:00", "2024-01-30 20:00",  # user 1: both -> kept
        "2024-01-01 02:00", "2024-01-15 12:00",  # user 2: early only
        "2024-01-30 19:00",                       # user 3: late only
        "2024-01-10 10:00",                       # user 4: mid only
        "2024-01-01 03:00", "2024-01-30 23:00",  # user 5: both -> kept
    ])
    uid = [1, 1, 2, 2, 3, 4, 5, 5]
    pq.write_table(
        pa.table({"ts": pa.array(ts, type=pa.timestamp("us")),
                  "user_id": pa.array(uid, type=pa.int64())}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_intersect_users

    got = q_intersect_users(str(tmp_path)).to_pandas()["user_id"].tolist()
    assert got == [1, 5]


def test_intersect_users_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"ts": pa.array([], type=pa.timestamp("us")),
                  "user_id": pa.array([], type=pa.int64())}),
        tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_intersect_users

    out = q_intersect_users(str(tmp_path)).to_pandas()
    assert list(out.columns) == ["user_id"] and out.empty


def test_incremental_exact_dedup_hand_case(ray_session, tmp_path):
    """New docs dedup against the base epoch's keeper state: base keeper wins
    over a same-hash new doc; a hash unseen in base first-wins among new."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_resolution_pipeline_ray.functions.hashing import md5_u64

    # find doc_ids on each side of the md5%4 epoch split
    new_ids = [i for i in range(1, 200) if md5_u64(str(i)) % 4 == 0]
    base_ids = [i for i in range(1, 200) if md5_u64(str(i)) % 4 != 0]
    b0, b1 = base_ids[0], base_ids[1]
    n0, n1, n2, n3 = new_ids[0], new_ids[1], new_ids[2], new_ids[3]
    rows = {
        b0: "shared alpha", b1: "base only",
        n0: "shared alpha",          # dup of base keeper b0
        n1: "fresh text", n2: "fresh text",  # first-wins among new
        n3: "unique new",            # keeper of itself
    }
    ids = sorted(rows)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array([rows[i] for i in ids], type=pa.string())}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.dedup import d_incremental_exact

    got = d_incremental_exact(str(tmp_path)).to_pandas().set_index("doc_id")
    lo, hi = min(n1, n2), max(n1, n2)
    assert got.loc[n0, "keeper_id"] == b0 and got.loc[n0, "is_dup"] == 1
    assert got.loc[lo, "keeper_id"] == lo and got.loc[lo, "is_dup"] == 0
    assert got.loc[hi, "keeper_id"] == lo and got.loc[hi, "is_dup"] == 1
    assert got.loc[n3, "keeper_id"] == n3 and got.loc[n3, "is_dup"] == 0
    assert set(got.index) == {n0, n1, n2, n3}


def test_incremental_fuzzy_equals_from_scratch(ray_session):
    """The epoch decomposition is exact: base-only pairs ∪ (≥1-new pairs from
    touched blocks) clustered together == the from-scratch fuzzy apply."""
    from entity_resolution_pipeline_ray.pipelines.dedup import (
        d_incremental_fuzzy,
        dedup_apply_fuzzy,
    )

    inc = d_incremental_fuzzy(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = dedup_apply_fuzzy(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert inc.equals(ref)
    # cross-epoch resolutions actually occurred: some doc's rep is in the
    # OTHER epoch (md5(doc_id)%4 splits every 4th doc into the new shard)
    from entity_resolution_pipeline_ray.functions.hashing import md5_u64

    new = inc["doc_id"].map(lambda i: md5_u64(str(int(i))) % 4 == 0)
    rep_new = inc["rep_doc_id"].map(lambda i: md5_u64(str(int(i))) % 4 == 0)
    assert ((new != rep_new) & (inc["doc_id"] != inc["rep_doc_id"])).any()
