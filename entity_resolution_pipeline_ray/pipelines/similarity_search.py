"""Similarity search over an embedding column (``embeddings`` table):
brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path.

The brute-force path broadcasts the query matrix once (``ray.put``) and does
one matmul per batch — the canonical "small side broadcast, big side streams"
pattern.  The LSH path buckets both corpus and queries by hyperplane sign bits
and only scores within matching buckets (multi-probe over all sign flips of
``probe_bits`` lowest bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import hyperplane_code_sql, hyperplanes
from ..rayops import list_float_matrix, read_parquet_clean


def _embeddings(sf_dir: str):
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _fixed_queries(sf_dir: str, n_queries: int = 4):
    """Deterministic query set: the embeddings of the n lowest vec_ids."""
    import duckdb

    con = duckdb.connect()
    q = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id LIMIT {n_queries}"
    ).fetchall()
    con.close()
    qids = np.array([r[0] for r in q], dtype=np.int64)
    qmat = np.array([r[1] for r in q], dtype=np.float64)
    return qids, qmat


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 4):
    """Exact top-k cosine per query: batch × broadcast-queries matmul, per-batch
    partial top-k, driver-side final merge (classic distributed top-k:
    per-block partials then tiny global reduce).

    Returns (query_id, vec_id, rank) — rank 1..k by (cosine desc, vec_id asc).
    Self-matches (vec_id == query_id) are excluded.
    """
    qids, qmat = _fixed_queries(sf_dir, n_queries)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qref = ray.put((qids, qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        ids_q, qm = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_float_matrix(t["embedding"])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = qm @ m.T  # (n_q, batch)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            s = sims[qi]
            mask = ids != ids_q[qi]
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            kk = min(k, len(cand_idx))
            # per-block top-k by the SAME (score desc, vec_id asc) order as the
            # driver merge + oracle, so a k-boundary score tie can't drop the
            # candidate the global order would keep
            order = np.lexsort((ids[cand_idx], -s[cand_idx]))
            sel = cand_idx[order[:kk]]
            out_q.extend([int(ids_q[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = _embeddings(sf_dir).map_batches(partial_topk, batch_format="pyarrow", batch_size=2048)
    pdf = partials.to_pandas()  # tiny: n_queries * k per block
    pdf = pdf.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    top = pdf.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top[["query_id", "vec_id", "rank"]].astype(np.int64), preserve_index=False)


KNN_BRUTEFORCE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 4),
scored AS (
  SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


S_HARD_NEGATIVES_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql
           FROM embeddings ORDER BY vec_id LIMIT 4),
scored AS (
  SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.query_id AND e.label <> q.ql)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


def knn_lsh(sf_dir: str, k: int = 10, n_queries: int = 4, n_planes: int = 6, seed: int = 42, probe_radius: int = 2):
    """LSH-bucketed ANN: random-hyperplane sign buckets; queries multi-probe all
    buckets within Hamming distance ``probe_radius`` of their own.  Approximate
    — recall measured against knn_bruteforce in tests; the scale path when the
    corpus is too big to scan per query.  For near-orthogonal corpora (top
    neighbors at cosine ~0.3) the collision probability per plane is only
    ~0.6, so radius-2 probing over 6 planes (~22 buckets of 64) is what keeps
    recall usable — a planted-near-duplicate corpus needs far less probing."""
    qids, qmat = _fixed_queries(sf_dir, n_queries)
    # plane count adapts only to dim at build; deterministic from seed
    emb0 = _embeddings(sf_dir).take(1)
    dim = len(emb0[0]["embedding"])
    planes = hyperplanes(n_planes, dim, seed)

    def bucket_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0).astype(np.uint8) @ (1 << np.arange(n_planes, dtype=np.uint64))

    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qbuckets = bucket_of(qmat)
    from itertools import combinations

    probe: dict[int, list[int]] = {}
    for qi, qb in enumerate(qbuckets):
        bs = {int(qb)}
        if probe_radius >= 1:
            bs |= {int(qb) ^ (1 << p) for p in range(n_planes)}
        if probe_radius >= 2:
            bs |= {int(qb) ^ (1 << p) ^ (1 << q2) for p, q2 in combinations(range(n_planes), 2)}
        for bb in bs:
            probe.setdefault(bb, []).append(qi)
    ref = ray.put((qids, qn, probe, planes))

    def partial(t: pa.Table) -> pa.Table:
        ids_q, qm, pr, pl = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_float_matrix(t["embedding"])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        buckets = ((m @ pl.T) > 0).astype(np.uint8) @ (1 << np.arange(pl.shape[0], dtype=np.uint64))
        out_q, out_v, out_s = [], [], []
        for b in np.unique(buckets):
            qlist = pr.get(int(b))
            if not qlist:
                continue
            rows = np.nonzero(buckets == b)[0]
            sims = qm[qlist] @ mn[rows].T
            for j, qi in enumerate(qlist):
                mask = ids[rows] != ids_q[qi]
                rsel = rows[mask]
                if len(rsel) == 0:
                    continue
                out_q.extend([int(ids_q[qi])] * len(rsel))
                out_v.extend(ids[rsel].tolist())
                out_s.extend(sims[j][mask].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = _embeddings(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=2048)
    pdf = partials.to_pandas()
    if pdf.empty:
        return pa.table({"query_id": pa.array([], type=pa.int64()), "vec_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    pdf = pdf.drop_duplicates(["query_id", "vec_id"]).sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    top = pdf.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top[["query_id", "vec_id", "rank"]].astype(np.int64), preserve_index=False)


def _knn_lsh_sql(k: int = 10, n_queries: int = 4, n_planes: int = 6, seed: int = 42, dim: int = 64) -> str:
    """SQL replica of ``knn_lsh``: radius-2 multi-probe means a corpus vector is
    scored for a query iff Hamming(code_q, code_v) <= 2; ranking uses the same
    (score DESC, vec_id ASC) order.  Score is float64 cosine (dot over the
    product of norms — DuckDB's ``list_cosine_similarity`` is float32, too
    coarse near ties).  ``dim`` is the testdata embedding width (64 in every sf
    dir); the engine reads it from data."""
    code = hyperplane_code_sql("e", n_planes, dim, seed)
    return f"""
WITH c AS (
  SELECT vec_id, e, {code} AS code, sqrt(list_dot_product(e, e)) AS nrm
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
q AS (SELECT vec_id AS query_id, e AS qe, code AS qcode, nrm AS qnrm
      FROM c ORDER BY vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id, list_dot_product(q.qe, c.e) / (q.qnrm * c.nrm) AS score
  FROM q, c
  WHERE c.vec_id <> q.query_id AND bit_count(xor(q.qcode, c.code)) <= 2)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {k}
"""


KNN_LSH_SQL = _knn_lsh_sql()


def _sq_dists(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared L2 from every row of ``m`` to every centroid, via the
    ||x||² − 2x·y + ||y||² expansion (the exact formula the SQL oracle uses,
    so tie behavior matches)."""
    x2 = (m * m).sum(axis=1)[:, None]
    c2 = (cents * cents).sum(axis=1)[None, :]
    return x2 - 2.0 * (m @ cents.T) + c2


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 4,
    n_cells: int = 16,
    n_iters: int = 2,
    n_probe: int = 4,
):
    """IVF-Flat ANN: k-means coarse quantizer + per-query probing of the
    ``n_probe`` nearest cells — the classic inverted-file scale path (at 100 TB
    only ~n_probe/n_cells of the corpus is scanned per query, and the cell
    assignment is a reusable partitioning key for the corpus).

    The k-means is distributed and deterministic: seeds are the embeddings of
    the ``n_cells`` lowest vec_ids (no RNG), each Lloyd iteration is one
    ``map_batches`` pass emitting per-cell partial (sum, count) — a combiner,
    never a shuffle — reduced on the driver to the (n_cells × dim) update.
    The final scan fuses cell assignment + probe filtering + cosine scoring in
    one streaming pass; per-block partial top-k rows merge on the driver.
    Ranking order is (cosine DESC, vec_id ASC), ties included, like the other
    kNN variants.  With ``n_probe == n_cells`` this is exhaustive and equals
    ``knn_bruteforce`` exactly (pinned by test).
    """
    qids, qmat = _fixed_queries(sf_dir, n_queries)
    _, seed_mat = _fixed_queries(sf_dir, n_cells)
    emb = _embeddings(sf_dir)
    cents = _train_kmeans(emb, seed_mat.astype(np.float64), n_iters)

    # per-query probe sets: n_probe nearest final centroids, ties → lowest cid
    qd2 = _sq_dists(qmat, cents)
    probe_sets = []
    for qi in range(len(qids)):
        order = np.lexsort((np.arange(len(cents)), qd2[qi]))
        probe_sets.append(frozenset(int(c) for c in order[:n_probe]))
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((qids, qn, probe_sets, cents))

    def partial_topk(t: pa.Table) -> pa.Table:
        ids_q, qm, probes, c = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_float_matrix(t["embedding"])
        cells = np.argmin(_sq_dists(m, c), axis=1)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            mask = np.isin(cells, list(probes[qi])) & (ids != ids_q[qi])
            rows = np.nonzero(mask)[0]
            if len(rows) == 0:
                continue
            s = mn[rows] @ qm[qi]
            # per-block top-k by the FINAL (score desc, vec_id asc) total order
            # — tie-safe, so the driver merge of partials is exact
            order = np.lexsort((ids[rows], -s))
            sel = order[: min(k, len(rows))]
            out_q.extend([int(ids_q[qi])] * len(sel))
            out_v.extend(ids[rows[sel]].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = emb.map_batches(partial_topk, batch_format="pyarrow", batch_size=2048)
    pdf = partials.to_pandas()
    if pdf.empty:
        return pa.table({"query_id": pa.array([], type=pa.int64()), "vec_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    pdf = pdf.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    top = pdf.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top[["query_id", "vec_id", "rank"]].astype(np.int64), preserve_index=False)


def _train_kmeans(emb, cents: np.ndarray, n_iters: int) -> np.ndarray:
    """Distributed deterministic Lloyd iterations: each round is ONE
    ``map_batches`` pass emitting per-cell partial (sum, count) combiners —
    never a shuffle — reduced on the driver to the (n_cells × dim) update.
    Ties assign to the lowest cid; an empty cell keeps its previous centroid
    (mirrored by the SQL oracle's left-join + coalesce)."""
    for _ in range(n_iters):
        cref = ray.put(cents)

        def partial_sums(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            m = list_float_matrix(t["embedding"])
            a = np.argmin(_sq_dists(m, c), axis=1)  # ties → lowest cid
            cids, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((len(cids), m.shape[1]), dtype=np.float64)
            np.add.at(sums, inv, m)
            return pa.table(
                {
                    "cid": pa.array(cids.astype(np.int64)),
                    "cnt": pa.array(np.bincount(inv).astype(np.int64)),
                    "s": pa.array([row.tolist() for row in sums]),
                }
            )

        parts = emb.map_batches(partial_sums, batch_format="pyarrow", batch_size=4096).to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for cid, cnt, sv in zip(parts["cid"], parts["cnt"], parts["s"]):
            sums[int(cid)] += np.asarray(sv, dtype=np.float64)
            counts[int(cid)] += int(cnt)
        cents = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], cents)
    return cents


def s_kmeans(sf_dir: str, n_cells: int = 16, n_iters: int = 2):
    """Distributed k-means clustering of the embedding corpus exposed as a
    query: the IVF coarse quantizer's deterministic Lloyd training (seeds =
    lowest vec_ids, combiner-only rounds) followed by one streaming
    assignment pass.  Emits (vec_id, cid) — the reusable partitioning key
    the 100-TB corpus would be bucketed by (SemDeDup-style cluster-then-
    dedup, IVF cell lists, per-cluster sampling all start here)."""
    _, seed_mat = _fixed_queries(sf_dir, n_cells)
    emb = _embeddings(sf_dir)
    cents = _train_kmeans(emb, seed_mat.astype(np.float64), n_iters)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = list_float_matrix(t["embedding"])
        a = np.argmin(_sq_dists(m, c), axis=1)
        return pa.table(
            {
                "vec_id": t["vec_id"].combine_chunks().cast(pa.int64()),
                "cid": pa.array(a.astype(np.int64), type=pa.int64()),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow")


def _kmeans_sql(n_cells: int = 16, n_iters: int = 2, dim: int = 64) -> str:
    """IVF replica's CTE chain cut at the final assignment — composed from the
    shared CTE builder, not substring surgery on the rendered kNN SQL."""
    ctes = _ivf_assignment_ctes(n_cells=n_cells, n_iters=n_iters, dim=dim)
    return "WITH " + ",\n".join(ctes) + "\nSELECT vec_id, cid FROM asgf"


def _d2_sql(x: str, cent: str) -> str:
    return (
        f"list_dot_product({x},{x}) - 2*list_dot_product({x},{cent})"
        f" + list_dot_product({cent},{cent})"
    )


def _ivf_assignment_ctes(n_cells: int = 16, n_iters: int = 2, dim: int = 64) -> list[str]:
    """Shared CTE chain: deterministic seeds (lowest vec_ids), unrolled Lloyd
    iterations (asgN → centN+1, empty cells keep the previous centroid via
    left join + coalesce), ending at the final assignment ``asgf``."""
    d2 = _d2_sql
    ctes = [
        "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"""cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, e AS ce
  FROM c ORDER BY vec_id LIMIT {n_cells})""",
    ]
    for t in range(n_iters):
        ctes.append(f"""asg{t} AS (
  SELECT vec_id, e, cid FROM (
    SELECT c.vec_id, c.e, t.cid,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY {d2("c.e", "t.ce")}, t.cid) AS rn
    FROM c, cent{t} t) WHERE rn = 1)""")
        ctes.append(f"""cent{t + 1} AS (
  SELECT t.cid, coalesce(m.me, t.ce) AS ce
  FROM cent{t} t LEFT JOIN (
    SELECT cid, list(v ORDER BY i) AS me FROM (
      SELECT cid, i, avg(e[CAST(i AS INT)]) AS v
      FROM asg{t}, range(1, {dim + 1}) r(i) GROUP BY cid, i)
    GROUP BY cid) m ON t.cid = m.cid)""")
    T = n_iters
    ctes.append(f"""asgf AS (
  SELECT vec_id, e, cid FROM (
    SELECT c.vec_id, c.e, t.cid,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY {d2("c.e", "t.ce")}, t.cid) AS rn
    FROM c, cent{T} t) WHERE rn = 1)""")
    return ctes


def _knn_ivf_sql(
    k: int = 10, n_queries: int = 4, n_cells: int = 16, n_iters: int = 2, n_probe: int = 4, dim: int = 64
) -> str:
    """Exact SQL replica of ``knn_ivf``: the shared assignment CTE chain plus
    the same probe rule and float64 cosine ranking."""
    d2 = _d2_sql
    T = n_iters
    ctes = _ivf_assignment_ctes(n_cells=n_cells, n_iters=n_iters, dim=dim)
    ctes.append(f"""q AS (
  SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qn
  FROM c ORDER BY vec_id LIMIT {n_queries})""")
    ctes.append(f"""probes AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, t.cid,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {d2("q.qe", "t.ce")}, t.cid) AS rn
    FROM q, cent{T} t) WHERE rn <= {n_probe})""")
    ctes.append("""scored AS (
  SELECT q.query_id, a.vec_id,
         list_dot_product(q.qe, a.e) / (q.qn * sqrt(list_dot_product(a.e, a.e))) AS score
  FROM q JOIN probes p ON p.query_id = q.query_id
         JOIN asgf a ON a.cid = p.cid
  WHERE a.vec_id <> q.query_id)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= {k}
"""
    )


KNN_IVF_SQL = _knn_ivf_sql()
S_KMEANS_SQL = _kmeans_sql()


def s_label_centroids(sf_dir: str):
    """Per-label embedding centroid (classifier prototype / k-means-seeding
    aggregate): per-batch (label -> sum-vector, count) combiners shrink the
    shuffle to one row per label per block; the driver merges the tiny partial
    table and emits long-format (label, i, mean_val) rows for exact scalar
    oracle comparison.  Label cardinality is bounded (a class space, not the
    corpus), so the driver merge is constant-size at any corpus scale."""
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = list_float_matrix(t["embedding"])
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs, sums, ns = [], [], []
        for lb in np.unique(labels):
            mask = labels == lb
            labs.append(int(lb))
            sums.append(m[mask].sum(axis=0))
            ns.append(int(mask.sum()))
        dim = m.shape[1] if m.size else 1
        return pa.table(
            {
                "label": pa.array(labs, type=pa.int64()),
                "s": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(sums) if sums else np.empty(0), type=pa.float64()), dim
                ),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    parts = [
        b
        for b in emb.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:  # empty embeddings table: np.concatenate([]) raises
        return pa.table(
            {
                "label": pa.array([], type=pa.int64()),
                "i": pa.array([], type=pa.int64()),
                "mean_val": pa.array([], type=pa.float64()),
            }
        )
    labs = np.concatenate([p["label"].to_numpy(zero_copy_only=False) for p in parts])
    ns = np.concatenate([p["n"].to_numpy(zero_copy_only=False) for p in parts])
    dim = parts[0]["s"].type.list_size if parts else 1
    sums = np.concatenate(
        [np.asarray(p["s"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(len(p), dim) for p in parts]
    )
    out_lab, out_i, out_v = [], [], []
    for lb in np.unique(labs):
        mask = labs == lb
        mean = sums[mask].sum(axis=0) / ns[mask].sum()
        out_lab.append(np.full(dim, lb, dtype=np.int64))
        out_i.append(np.arange(1, dim + 1, dtype=np.int64))
        out_v.append(np.round(mean, 6))
    return pa.table(
        {
            "label": pa.array(np.concatenate(out_lab), type=pa.int64()),
            "i": pa.array(np.concatenate(out_i), type=pa.int64()),
            "mean_val": pa.array(np.concatenate(out_v), type=pa.float64()),
        }
    )


S_LABEL_CENTROIDS_SQL = """
SELECT label, i, round(avg(e), 6) AS mean_val FROM (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings)
GROUP BY label, i
"""


def knn_filtered(sf_dir: str, k: int = 10, n_queries: int = 4):
    """Filtered vector search: exact top-k cosine per query restricted to
    candidates sharing the query's label — the metadata-filtered ANN shape,
    with the predicate pushed into the scan (per-batch mask before the
    partial top-k) rather than post-filtering a larger candidate list, so
    there is no recall loss and no over-fetch."""
    return _knn_label_predicate(sf_dir, k, n_queries, same_label=True)


def s_hard_negatives(sf_dir: str, k: int = 10, n_queries: int = 4):
    """Hard-negative mining for embedding training (the in-batch-negatives
    upgrade: Xiong et al., ANCE, arXiv:2007.00808): per query, the top-k most
    similar vectors with a DIFFERENT label — the candidates most likely to
    confuse a contrastive learner.  Same pushed-predicate scan as
    knn_filtered with the label test inverted."""
    return _knn_label_predicate(sf_dir, k, n_queries, same_label=False)


def _knn_label_predicate(sf_dir: str, k: int, n_queries: int, *, same_label: bool):
    import duckdb

    con = duckdb.connect()
    q = con.sql(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id LIMIT {n_queries}"
    ).fetchall()
    con.close()
    qids = np.array([r[0] for r in q], dtype=np.int64)
    qmat = np.array([r[1] for r in q], dtype=np.float64)
    qlabels = np.array([r[2] for r in q], dtype=np.int64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qref = ray.put((qids, qn, qlabels))

    def partial_topk(t: pa.Table) -> pa.Table:
        ids_q, qm, labs_q = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_float_matrix(t["embedding"])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = qm @ m.T
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            s = sims[qi]
            lab_ok = (labs == labs_q[qi]) if same_label else (labs != labs_q[qi])
            mask = (ids != ids_q[qi]) & lab_ok
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            kk = min(k, len(cand_idx))
            order = np.lexsort((ids[cand_idx], -s[cand_idx]))
            sel = cand_idx[order[:kk]]
            out_q.extend([int(ids_q[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=2048)
    pdf = partials.to_pandas()
    pdf = pdf.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    top = pdf.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top[["query_id", "vec_id", "rank"]].astype(np.int64), preserve_index=False)


KNN_FILTERED_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql
           FROM embeddings ORDER BY vec_id LIMIT 4),
scored AS (
  SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.query_id AND e.label = q.ql)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


# ------------------------------------------------------------- BM25 retrieval
# Sparse lexical retrieval over the documents table — the text-side sibling of
# the dense kNN family (Robertson & Zaragoza's BM25, Lucene idf variant:
# idf = ln((N - df + 0.5) / (df + 0.5) + 1)).  Two streaming passes:
#  1. corpus statistics — per-batch partials (doc count, total doc length,
#     per-term document frequency), one tiny combiner row per batch;
#  2. scoring — broadcast the <query-terms>-sized idf table, per-batch
#     vectorized tf via Arrow tokenize + index_in + one bincount, per-block
#     partial top-k, tiny driver merge (same plan as knn_bruteforce).
# Nothing corpus-sized touches the driver; the shuffle count is zero.

BM25_TERMS = ("table", "scan", "merge", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_tf_dl(text_col, terms: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(tf matrix [n_docs x n_terms], doc lengths) for one batch — tokenizer
    parity with the oracle via functions.text.token_lists_arrow."""
    import pyarrow.compute as pc

    from ..functions.text import token_lists_arrow

    flat, offsets = token_lists_arrow(text_col)
    dl = np.diff(offsets)
    n, m = len(dl), len(terms)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), dl)
    tid = pc.fill_null(pc.index_in(flat, value_set=terms), -1).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = tid >= 0
    tf = np.bincount(doc_idx[valid] * m + tid[valid], minlength=n * m).reshape(n, m)
    return tf, dl


def s_bm25_topk(sf_dir: str, k: int = 10, terms: tuple = BM25_TERMS):
    """Top-k documents by BM25 for a fixed query-term set.

    Returns (doc_id, score, rank) — rank 1..k by (score desc, doc_id asc),
    restricted to docs containing at least one query term (score > 0),
    score rounded to 6 decimals (oracle float parity)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    terms_arr = pa.array(list(terms), type=pa.string())
    m = len(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        tf, dl = _bm25_tf_dl(t["text"], terms_arr)
        row = {"n_docs": [len(dl)], "sum_dl": [int(dl.sum())]}
        for i in range(m):
            row[f"df_{i}"] = [int((tf[:, i] > 0).sum())]
        return pa.table(row)

    parts = docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_total = int(parts["n_docs"].sum()) if len(parts) else 0
    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "score": pa.array([], type=pa.float64()),
         "rank": pa.array([], type=pa.int64())}
    )
    if n_total == 0:
        return rd.from_arrow(empty)
    sum_dl = int(parts["sum_dl"].sum())
    df = np.array([int(parts[f"df_{i}"].sum()) for i in range(m)], dtype=np.float64)
    idf = np.log((n_total - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = max(sum_dl / n_total, 1e-12)
    ref = ray.put((idf, avgdl))

    def score_topk(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(ref)
        tf, dl = _bm25_tf_dl(t["text"], terms_arr)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl_))[:, None]
        s = (idf_ * (tf * (BM25_K1 + 1.0)) / np.maximum(denom, 1e-12)).sum(axis=1)
        pos = np.nonzero(s > 0)[0]
        if len(pos) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()), "score": pa.array([], type=pa.float64())})
        order = np.lexsort((ids[pos], -s[pos]))[: min(k, len(pos))]
        sel = pos[order]
        return pa.table(
            {"doc_id": pa.array(ids[sel], type=pa.int64()), "score": pa.array(s[sel], type=pa.float64())}
        )

    pdf = docs.map_batches(score_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    if len(pdf) == 0:
        return rd.from_arrow(empty)
    pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(pdf["doc_id"].to_numpy(), type=pa.int64()),
                "score": pa.array(np.round(pdf["score"].to_numpy(), 6), type=pa.float64()),
                "rank": pa.array(np.arange(1, len(pdf) + 1), type=pa.int64()),
            }
        )
    )


def _bm25_sql(k: int = 10, terms: tuple = BM25_TERMS, k1: float = BM25_K1, b: float = BM25_B) -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS tok
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
corpus AS (SELECT (SELECT count(*) FROM documents) AS n,
                  (SELECT coalesce(sum(dl), 0) FROM dl) AS sum_dl),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
       WHERE tok IN ({term_list}) GROUP BY doc_id, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
         sum( ln((corpus.n - df.df + 0.5) / (df.df + 0.5) + 1)
              * tf.tf * ({k1} + 1)
              / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / (corpus.sum_dl / corpus.n)))) AS score
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), corpus
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 6) AS score, CAST(rank AS BIGINT) AS rank FROM (
  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM scored)
WHERE rank <= {k}
"""


S_BM25_SQL = _bm25_sql()


# ------------------------------------------------------ product quantization
# PQ-ADC approximate search (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011): split each vector into N_SUB subspaces, learn
# a tiny k-means codebook per subspace, store every corpus vector as N_SUB
# byte codes (8 bytes/vector at 64-dim — the 64x compression that makes a
# 100-TB corpus scannable from RAM), and answer queries via asymmetric
# distance computation: per-query lookup tables of query-to-centroid squared
# distances, one table gather + add per subspace per vector.
#
# Float-parity discipline (what makes this SQL-oracle-able): every squared-L2
# distance and every ADC score is evaluated as a LEFT-ASSOCIATIVE chain on
# both sides — numpy accumulates term by term below, the generated SQL nests
# parentheses the same way — and centroid updates round to 6 decimals after
# the mean, so Lloyd iterations produce bit-identical codebooks in both
# engines (DuckDB avg() and the engine's partial-sum merge may sum in
# different orders; the round absorbs the ulps).

PQ_SUB_DIM = 8


def _chain_sq_dists(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances with LEFT-ASSOCIATIVE per-dimension
    accumulation — FP-order-pinned to the SQL chain expression."""
    out = (m[:, [0]] - c[None, :, 0]) ** 2
    for j in range(1, m.shape[1]):
        out = out + (m[:, [j]] - c[None, :, j]) ** 2
    return out


def knn_pq(sf_dir: str, k: int = 10, n_queries: int = 4, n_cells: int = 16, n_iters: int = 2):
    """PQ-ADC top-k by approximate squared L2 distance (rank asc, ties by
    vec_id; self-matches excluded).  Training is one ``map_batches`` pass per
    Lloyd iteration covering ALL subspaces (per-(subspace, cell) partial sums
    — a combiner, never a shuffle); the scan fuses encode + table gather +
    per-block partial top-k."""
    qids, qmat = _fixed_queries(sf_dir, n_queries)
    _, seed_mat = _fixed_queries(sf_dir, n_cells)
    emb = _embeddings(sf_dir)
    dim = qmat.shape[1]
    if dim % PQ_SUB_DIM:
        raise ValueError(f"dim {dim} not divisible by PQ_SUB_DIM {PQ_SUB_DIM}")
    n_sub = dim // PQ_SUB_DIM
    cents = np.stack(
        [seed_mat[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM].astype(np.float64) for s in range(n_sub)]
    )  # (n_sub, n_cells, PQ_SUB_DIM)

    for _ in range(n_iters):
        cref = ray.put(cents)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            m = list_float_matrix(t["embedding"])
            sub_col, cid_col, cnt_col, sum_col = [], [], [], []
            for s in range(c.shape[0]):
                sub = m[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
                a = np.argmin(_chain_sq_dists(sub, c[s]), axis=1)  # ties → lowest cid
                cids, inv = np.unique(a, return_inverse=True)
                sums = np.zeros((len(cids), PQ_SUB_DIM), dtype=np.float64)
                np.add.at(sums, inv, sub)
                sub_col.extend([s] * len(cids))
                cid_col.extend(int(x) for x in cids)
                cnt_col.extend(int(x) for x in np.bincount(inv))
                sum_col.extend(row.tolist() for row in sums)
            return pa.table(
                {
                    "sub": pa.array(sub_col, type=pa.int64()),
                    "cid": pa.array(cid_col, type=pa.int64()),
                    "cnt": pa.array(cnt_col, type=pa.int64()),
                    "s": pa.array(sum_col),
                }
            )

        parts = emb.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros((n_sub, n_cells), dtype=np.int64)
        for sub, cid, cnt, sv in zip(parts["sub"], parts["cid"], parts["cnt"], parts["s"]):
            sums[int(sub), int(cid)] += np.asarray(sv, dtype=np.float64)
            counts[int(sub), int(cid)] += int(cnt)
        # updated cells: round(mean, 6); empty cells keep the previous value
        means = np.round(sums / np.maximum(counts, 1)[:, :, None], 6)
        cents = np.where(counts[:, :, None] > 0, means, cents)

    # per-(subspace, query) ADC lookup tables, same chain arithmetic
    luts = np.stack(
        [_chain_sq_dists(qmat[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM].astype(np.float64), cents[s]) for s in range(n_sub)]
    )  # (n_sub, n_q, n_cells)
    ref = ray.put((qids, luts, cents))

    def scan(t: pa.Table) -> pa.Table:
        ids_q, lt, c = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_float_matrix(t["embedding"])
        codes = [
            np.argmin(_chain_sq_dists(m[:, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM], c[s]), axis=1)
            for s in range(c.shape[0])
        ]
        out_q, out_v, out_d = [], [], []
        for qi in range(len(ids_q)):
            d = lt[0][qi][codes[0]]
            for s in range(1, len(codes)):
                d = d + lt[s][qi][codes[s]]  # left-assoc, matches the SQL chain
            mask = ids != ids_q[qi]
            rows = np.nonzero(mask)[0]
            if len(rows) == 0:
                continue
            order = np.lexsort((ids[rows], d[rows]))
            sel = rows[order[: min(k, len(rows))]]
            out_q.extend([int(ids_q[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_d.extend(d[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "d": pa.array(out_d, type=pa.float64()),
            }
        )

    pdf = emb.map_batches(scan, batch_format="pyarrow", batch_size=2048).to_pandas()
    if pdf.empty:
        return pa.table({"query_id": pa.array([], type=pa.int64()), "vec_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    pdf = pdf.sort_values(["query_id", "d", "vec_id"], ascending=[True, True, True])
    top = pdf.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top[["query_id", "vec_id", "rank"]].astype(np.int64), preserve_index=False)


def _knn_pq_sql(k: int = 10, n_queries: int = 4, n_cells: int = 16, n_iters: int = 2,
                dim: int = 64, sub_dim: int = PQ_SUB_DIM) -> str:
    """Exact SQL replica of ``knn_pq``: per-subspace Lloyd iterations unrolled
    as CTE pairs (assign → round(avg,6) update with empty cells kept), codes
    from the final codebooks, ADC lookup tables and the ADC score all written
    as the SAME left-associative chains the engine evaluates."""
    n_sub = dim // sub_dim

    def chain(terms):
        expr = terms[0]
        for t in terms[1:]:
            expr = f"({expr} + {t})"
        return expr

    def dist(vexpr: str, base: int, c: str) -> str:
        return chain(
            [f"({vexpr}[{base + j + 1}] - {c}.c{j}) * ({vexpr}[{base + j + 1}] - {c}.c{j})" for j in range(sub_dim)]
        )

    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {n_cells}))",
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT {n_queries})",
    ]
    for s in range(n_sub):
        base = s * sub_dim
        cols = ", ".join(f"v[{base + j + 1}] AS c{j}" for j in range(sub_dim))
        ctes.append(f"c{s}_0 AS (SELECT cid, {cols} FROM seeds)")
        for it in range(n_iters):
            ctes.append(
                f"a{s}_{it} AS (SELECT vec_id, cid FROM ("
                f"SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id "
                f"ORDER BY {dist('e.v', base, 'c')} ASC, c.cid ASC) AS rn FROM e, c{s}_{it} c) WHERE rn = 1)"
            )
            means = ", ".join(f"avg(e.v[{base + j + 1}]) AS m{j}" for j in range(sub_dim))
            upd = ", ".join(f"coalesce(round(u.m{j}, 6), p.c{j}) AS c{j}" for j in range(sub_dim))
            ctes.append(
                f"c{s}_{it + 1} AS (SELECT p.cid, {upd} FROM c{s}_{it} p LEFT JOIN ("
                f"SELECT a.cid, {means} FROM a{s}_{it} a JOIN e USING (vec_id) GROUP BY a.cid) u USING (cid))"
            )
        ctes.append(
            f"code{s} AS (SELECT vec_id, cid FROM ("
            f"SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {dist('e.v', base, 'c')} ASC, c.cid ASC) AS rn FROM e, c{s}_{n_iters} c) WHERE rn = 1)"
        )
        ctes.append(
            f"lut{s} AS (SELECT q.query_id, c.cid, {dist('q.qv', base, 'c')} AS l FROM q, c{s}_{n_iters} c)"
        )
    code_joins = " ".join(f"JOIN code{s} cd{s} USING (vec_id)" for s in range(n_sub))
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.cid = cd{s}.cid AND l{s}.query_id = l0.query_id" for s in range(1, n_sub)
    )
    score = chain([f"l{s}.l" for s in range(n_sub)])
    ctes.append(
        "scored AS ("
        f"SELECT l0.query_id, cd0.vec_id, {score} AS d "
        f"FROM e {code_joins} JOIN lut0 l0 ON l0.cid = cd0.cid {lut_joins} "
        "WHERE cd0.vec_id <> l0.query_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {k}
"""
    )


KNN_PQ_SQL = _knn_pq_sql()


def range_search(sf_dir: str, threshold: float = 0.25, n_queries: int = 4):
    """Range similarity search: ALL corpus vectors within cosine >= threshold
    of each fixed query — the radius-query counterpart of knn_bruteforce
    (retrieval recall sweeps, near-dup audits at a fixed similarity bar).
    Fully streaming: broadcast query matrix, one batch matmul + threshold
    mask per block, result flows out as a Dataset with NO driver merge at all
    (unlike top-k there is no global rank to reconcile).  Self-matches are
    excluded.  Output (query_id, vec_id)."""
    qids, qmat = _fixed_queries(sf_dir, n_queries)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qref = ray.put((qids, qn))

    def f(t: pa.Table) -> pa.Table:
        ids_q, qm = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = list_float_matrix(t["embedding"])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = qm @ m.T  # (n_q, batch)
        qi, vi = np.nonzero(sims >= threshold)
        keep = ids[vi] != ids_q[qi]
        return pa.table(
            {
                "query_id": pa.array(ids_q[qi][keep], type=pa.int64()),
                "vec_id": pa.array(ids[vi][keep], type=pa.int64()),
            }
        )

    return _embeddings(sf_dir).map_batches(f, batch_format="pyarrow", batch_size=2048)


S_RANGE_SEARCH_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 4)
SELECT q.query_id, e.vec_id
FROM q, embeddings e
WHERE e.vec_id <> q.query_id AND list_cosine_similarity(q.qe, e.embedding) >= 0.25
"""


def s_lsh_recall(sf_dir: str, k: int = 10, n_queries: int = 4):
    """Recall@k audit of the LSH index against the exact scan — the quality
    gate every ANN deployment publishes next to its latency numbers (and the
    reference's evaluation-report analog for retrieval: compare an
    approximate plan to ground truth, per query).  Both sides are the
    repo's own deterministic pipelines (knn_lsh / knn_bruteforce), so the
    audit itself is exactly SQL-oracled.  The comparison is driver-side on
    purpose: both inputs are top-k sets (n_queries x k rows) regardless of
    corpus size.  Output (query_id, n_hits, recall_bp) with recall in exact
    basis points (n_hits * 10000 // k — integer, no float-sum ambiguity)."""
    bf = knn_bruteforce(sf_dir, k=k, n_queries=n_queries).to_pandas()
    ap = knn_lsh(sf_dir, k=k, n_queries=n_queries).to_pandas()
    hit = bf.merge(ap[["query_id", "vec_id"]], on=["query_id", "vec_id"], how="inner")
    n_hits = hit.groupby("query_id").size()
    out = bf[["query_id"]].drop_duplicates().sort_values("query_id").reset_index(drop=True)
    out["n_hits"] = out["query_id"].map(n_hits).fillna(0).astype(np.int64)
    out["recall_bp"] = out["n_hits"] * 10_000 // k
    return pa.Table.from_pandas(out, preserve_index=False)


S_LSH_RECALL_SQL = f"""
WITH bf AS ({KNN_BRUTEFORCE_SQL}),
lsh AS ({KNN_LSH_SQL})
SELECT bf.query_id,
       CAST(count(lsh.vec_id) AS BIGINT) AS n_hits,
       CAST(count(lsh.vec_id) * 10000 // 10 AS BIGINT) AS recall_bp
FROM bf LEFT JOIN lsh ON bf.query_id = lsh.query_id AND bf.vec_id = lsh.vec_id
GROUP BY bf.query_id
"""


def s_knn_graph(sf_dir: str, k: int = 5, chunk_rows: int = 2048):
    """Exact kNN SELF-join (the kNN-graph build behind SemDeDup-style semantic
    clustering): every vector's top-k cosine neighbors over the whole corpus —
    both sides large, so no broadcast query set (contrast knn_bruteforce's
    fixed tiny query matrix).  Plan: chunk-pair block-nested loop (the
    d_embedding_pairs shape — one task per (chunk_i, chunk_j), each task pulls
    exactly TWO object-store chunks, nothing corpus-sized on the driver or in
    any worker) emits per-ROW partial top-k against the paired chunk in BOTH
    directions; ONE range shuffle then merges the partials into the final
    per-query top-k (map_sorted_groups — complete query groups per task).
    O(n²) compute is inherent to the exact graph; s_knn_lsh / s_knn_ivf /
    s_knn_pq are the sub-quadratic production paths, and s_lsh_recall is the
    audit that ties them to this baseline.  Partial volume is O(n·k·#chunks)
    rows, streamed — never materialized driver-side.  Per-chunk partial
    ordering is the SAME (cosine desc, vec_id asc) as the final merge and the
    SQL oracle, so a k-boundary score tie can never drop the candidate the
    global order keeps (the knn_bruteforce discipline).  Output
    (query_id, vec_id, rank), rank 1..k, self-pairs excluded."""
    from ..rayops import _block_num_rows, map_sorted_groups
    from .dedup import _normalized_embeddings

    # normalize ONCE before chunking (the _normalized_embeddings contract the
    # other embedding plans share); tasks then just view the FixedSizeList —
    # without this, each chunk would be re-normalized in every one of the ~c
    # pair tasks that touches it (O(n·d·c) redundant work)
    normed = _normalized_embeddings(sf_dir).materialize()
    n = normed.count()
    empty = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )
    if n == 0:
        return rd.from_arrow(empty)
    n_chunks = max(1, -(-n // chunk_rows))
    chunks = normed.repartition(n_chunks).materialize()
    refs = chunks.to_arrow_refs()
    sizes = ray.get([_block_num_rows.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, sizes) if c > 0]
    items = [{"i": i, "j": j} for i in range(len(refs)) for j in range(i, len(refs))]
    desc = rd.from_items(items).repartition(len(items))
    refs_ref = ray.put(refs)  # list of chunk ObjectRefs, not the data

    def _norm(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return ids, list_float_matrix(t["nvec"])

    def _row_topk(ids_q, ids_c, sims, exclude_self):
        # per row of `sims` (queries x candidates): top-k by (score desc, id asc)
        out_q, out_v, out_s = [], [], []
        for r in range(sims.shape[0]):
            s = sims[r]
            cand = np.nonzero(ids_c != ids_q[r])[0] if exclude_self else np.arange(len(ids_c))
            if len(cand) == 0:
                continue
            kk = min(k, len(cand))
            order = np.lexsort((ids_c[cand], -s[cand]))
            sel = cand[order[:kk]]
            out_q.append(np.full(len(sel), ids_q[r], dtype=np.int64))
            out_v.append(ids_c[sel])
            out_s.append(s[sel])
        if not out_q:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
        return (np.concatenate(out_q), np.concatenate(out_v), np.concatenate(out_s))

    def cross(batch: pa.Table) -> pa.Table:
        rl = ray.get(refs_ref)
        qs, vs, ss = [], [], []
        for i, j in zip(
            batch["i"].to_numpy(zero_copy_only=False), batch["j"].to_numpy(zero_copy_only=False)
        ):
            ids_i, mi = _norm(ray.get(rl[int(i)]))
            if int(i) == int(j):
                sims = mi @ mi.T
                q, v, s = _row_topk(ids_i, ids_i, sims, exclude_self=True)
                qs.append(q); vs.append(v); ss.append(s)
            else:
                ids_j, mj = _norm(ray.get(rl[int(j)]))
                sims = mi @ mj.T
                q, v, s = _row_topk(ids_i, ids_j, sims, exclude_self=False)
                qs.append(q); vs.append(v); ss.append(s)
                q, v, s = _row_topk(ids_j, ids_i, sims.T, exclude_self=False)
                qs.append(q); vs.append(v); ss.append(s)
        if not qs:  # empty descriptor block (repartition imbalance)
            qs, vs, ss = [np.empty(0, np.int64)], [np.empty(0, np.int64)], [np.empty(0, np.float64)]
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(vs), type=pa.int64()),
                "score": pa.array(np.concatenate(ss), type=pa.float64()),
            }
        )

    partials = desc.map_batches(cross, batch_format="pyarrow", batch_size=None)

    def final_topk(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s, q))  # (query asc, score desc, vec_id asc)
        qo, vo = q[order], v[order]
        new_grp = np.empty(len(qo), dtype=bool)
        if len(qo):
            new_grp[0] = True
            new_grp[1:] = qo[1:] != qo[:-1]
        starts = np.nonzero(new_grp)[0]
        rank = np.arange(len(qo), dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, len(qo)))) + 1
        keep = rank <= k
        return pa.table(
            {
                "query_id": pa.array(qo[keep], type=pa.int64()),
                "vec_id": pa.array(vo[keep], type=pa.int64()),
                "rank": pa.array(rank[keep], type=pa.int64()),
            }
        )

    return map_sorted_groups(partials, "query_id", final_topk, empty)


KNN_GRAPH_SQL = """
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         list_cosine_similarity(a.embedding, b.embedding) AS score
  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 5
"""
