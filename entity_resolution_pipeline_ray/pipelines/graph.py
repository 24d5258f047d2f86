"""Graph operators over a derived purchase graph (customer → supplier).

The web-scale analog is the hyperlink graph a crawl pipeline derives from
extracted pages (PageRank-style quality priors are standard web-corpus
curation signals — e.g. the Common Crawl harmonic-centrality rankings used to
pick crawl seeds).  The testdata has no link table, so the graph is derived
deterministically from the relational tables: one edge per DISTINCT
(customer, supplier) pair that appears on an order.  Node ids are parity-
encoded (customers even = 2*custkey, suppliers odd = 2*suppkey+1) so the
two id spaces stay disjoint at every scale factor.

Both operators are engine compositions, not driver algorithms:

- ``g_pagerank`` — K rounds of damped PageRank in EXACT integer arithmetic
  (ranks held in 1e-12 units; every division is a floor division) so the
  distributed sum order cannot perturb the result and the unrolled-CTE DuckDB
  oracle is bit-identical.  Dangling mass (suppliers have no out-edges) is
  dropped, a documented variant — ranks then sum to < SCALE, which is fine
  for a relative quality prior.  Dual plan per round: below
  ``broadcast_threshold_rows`` nodes, the rank/degree table is broadcast
  (``ray.put`` of sorted arrays) and each round is ONE streaming pass over
  the edges with per-batch ``bincount`` partials merged on the driver (node-
  cardinality state only — the million-node / billion-edge shape); above it,
  each round is an edges⋈ranks hash join + groupby-sum (the all-distributed
  plan), pinned equal in tests.
- ``g_components`` — connected components of the undirected purchase graph
  via the clustering stage's min-label propagation (stages/clustering.py),
  i.e. the SAME kernel the flagship uses for transitive entity clusters
  (reference analog: networkx connected components,
  /root/reference/src/batch_parallel_classification.py:840-943).

Oracle SQL: PageRank unrolls the K rounds as CTEs with identical integer
arithmetic; components uses a recursive min-label closure (the
D_APPLY_FUZZY_SQL pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..rayops import adaptive_partitions, first_per_key, read_parquet_clean, safe_join
from ..config import scale_gate

# node encoding: customers -> 2*custkey (even), suppliers -> 2*suppkey+1
# (odd) — disjoint id spaces at EVERY scale factor (an additive offset would
# collide once custkey exceeds it).  Edge key packing: ekey = (src << 31) |
# dst, exact while both node ids stay below 2^31 (~1 B customers / suppliers;
# asserted in the pack kernels — a silent wrap would corrupt the dedup).
EKEY_SHIFT = 31

# triangles_on_edges: below this edge count the sorted ekey set broadcasts
# (8 B/edge -> 40 MB at the cap) and closing edges are counted inside the
# wedge pass; above it, the wedge stream hash-joins the edge set instead
EDGE_BROADCAST_MAX_ROWS = 5_000_000

# triangles_on_edges: below this node count the (node, deg) arrays broadcast
# (16 B/node -> 80 MB at the cap) and endpoint degrees attach by searchsorted
# in one map; above it, two node-keyed hash joins attach them instead
NODE_BROADCAST_MAX_ROWS = 5_000_000
SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def _pack_edges(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    if len(src) and (int(src.max()) >= (1 << (63 - EKEY_SHIFT)) or int(dst.max()) >= (1 << EKEY_SHIFT)):
        raise ValueError("node id exceeds the 2^31 packing bound; widen EKEY_SHIFT")
    return (src << EKEY_SHIFT) | dst


def _pq(sf_dir: str, name: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


def purchase_edges(sf_dir: str, broadcast_threshold_rows: int = 2_000_000):
    """DISTINCT (src=2*o_custkey, dst=2*l_suppkey+1) edges.

    Plan: attach custkey to the lineitem stream (broadcast sorted-array
    lookup below the threshold, hash join above), pack the pair into one
    int64 key, then ONE range shuffle (``first_per_key``) dedups — the same
    sort-based distinct the blocking stage uses instead of Ray's slow
    hash-aggregate on row-cardinality keys."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    n_orders = orders.count()
    if n_orders <= scale_gate(broadcast_threshold_rows):
        odf = orders.to_pandas()
        # empty-result frames lose their columns (Ray empty-block semantics)
        ok = odf["o_orderkey"].to_numpy(dtype=np.int64) if n_orders else np.empty(0, np.int64)
        oc = odf["o_custkey"].to_numpy(dtype=np.int64) if n_orders else np.empty(0, np.int64)
        order = np.argsort(ok, kind="mergesort")
        ref = ray.put((ok[order], oc[order]))

        def to_ekey(t: pa.Table) -> pa.Table:
            k, c = ray.get(ref)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(k, lk)  # every lineitem has an order row
            src = 2 * c[pos]
            dst = 2 * t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
            return pa.table({"ekey": pa.array(_pack_edges(src, dst), type=pa.int64())})

        keyed = li.map_batches(to_ekey, batch_format="pyarrow")
    else:
        joined = safe_join(
            li,
            orders,
            num_partitions=adaptive_partitions(n_orders),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def pack(t: pa.Table) -> pa.Table:
            src = 2 * t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = 2 * t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
            return pa.table({"ekey": pa.array(_pack_edges(src, dst), type=pa.int64())})

        keyed = joined.map_batches(pack, batch_format="pyarrow")

    def unpack(t: pa.Table) -> pa.Table:
        ek = t["ekey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(ek >> EKEY_SHIFT, type=pa.int64()),
                "dst": pa.array(ek & ((1 << EKEY_SHIFT) - 1), type=pa.int64()),
            }
        )

    return first_per_key(keyed, "ekey").map_batches(unpack, batch_format="pyarrow")


def _node_deg_partials(t: pa.Table) -> pa.Table:
    """Per-batch (node, outdeg-partial) rows: every src with its in-batch edge
    count, every dst with 0 — the union is the node set and the sum per node
    is the out-degree."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    us, cs = np.unique(src, return_counts=True)
    ud = np.unique(dst)
    return pa.table(
        {
            "node": pa.array(np.concatenate([us, ud]), type=pa.int64()),
            "outdeg": pa.array(
                np.concatenate([cs.astype(np.int64), np.zeros(len(ud), np.int64)]), type=pa.int64()
            ),
        }
    )


def g_pagerank(sf_dir: str, iters: int = 5, broadcast_threshold_rows: int = 50_000_000):
    """Damped PageRank over the purchase graph, ``iters`` exact-integer rounds.

    rank0 = SCALE // N per node;
    round: rank'(v) = (SCALE*15//100)//N + Σ_{(u,v)∈E} ((rank(u)*85//100) // outdeg(u)).

    Returns (node, rank_units) for every node."""
    edges = purchase_edges(sf_dir).materialize()
    return pagerank_on_edges(edges, iters, broadcast_threshold_rows=broadcast_threshold_rows)


def pagerank_on_edges(
    edges,
    iters: int = 5,
    broadcast_threshold_rows: int = 50_000_000,
    driver_edge_threshold: int = 5_000_000,
):
    """Core PageRank over an arbitrary (src, dst) edge Dataset — see
    ``g_pagerank`` for the exact integer recurrence.  Three size-gated plans
    (the clustering-stage discipline — each larger plan stays tested):
    below ``driver_edge_threshold`` edges the slim int64 edge list is pulled
    once and iterated in numpy on the driver (each distributed round costs
    ~0.5 s of operator startup regardless of data size); below
    ``broadcast_threshold_rows`` the rank/deg table broadcasts and each round
    is one streaming edge pass; above it every round is an edges⋈ranks hash
    join + groupby-sum (the all-distributed 100-TB plan)."""
    from ray.data.aggregate import Sum
    deg_partials = edges.map_batches(_node_deg_partials, batch_format="pyarrow")
    n_edges = edges.count()

    if n_edges <= scale_gate(driver_edge_threshold):
        # ---- driver fast path: the edge list is slim int64 pairs
        parts = [
            b for b in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow") if b.num_rows
        ]
        if not parts:
            return pa.table({"node": pa.array([], type=pa.int64()), "rank_units": pa.array([], type=pa.int64())})
        src = np.concatenate([b["src"].to_numpy(zero_copy_only=False) for b in parts]).astype(np.int64)
        dst = np.concatenate([b["dst"].to_numpy(zero_copy_only=False) for b in parts]).astype(np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        deg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
        n = len(nodes)
        rank = np.full(n, SCALE // n, dtype=np.int64)
        teleport = (SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n
        for _ in range(iters):
            contrib = (rank[si] * DAMP_NUM // DAMP_DEN) // deg[si]
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, di, contrib)
            rank = teleport + acc
        return pa.table(
            {"node": pa.array(nodes, type=pa.int64()), "rank_units": pa.array(rank, type=pa.int64())}
        )

    if n_edges <= scale_gate(broadcast_threshold_rows):
        # ---- broadcast plan: node-cardinality driver state, one streaming
        # pass over the edges per round
        frames = [
            b.to_pandas()
            for b in deg_partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            if b.num_rows
        ]
        if not frames:
            return pa.table({"node": pa.array([], type=pa.int64()), "rank_units": pa.array([], type=pa.int64())})
        import pandas as pd

        nd = pd.concat(frames).groupby("node", sort=True)["outdeg"].sum()
        nodes = nd.index.to_numpy(dtype=np.int64)  # sorted
        deg = nd.to_numpy(dtype=np.int64)
        n = len(nodes)
        rank = np.full(n, SCALE // n, dtype=np.int64)
        teleport = (SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n
        for _ in range(iters):
            ref = ray.put((nodes, rank, deg))

            def step(t: pa.Table) -> pa.Table:
                nk, r, d = ray.get(ref)
                si = np.searchsorted(nk, t["src"].to_numpy(zero_copy_only=False))
                di = np.searchsorted(nk, t["dst"].to_numpy(zero_copy_only=False))
                contrib = (r[si] * DAMP_NUM // DAMP_DEN) // d[si]
                # int64 scatter-add: exact at any magnitude (bincount would
                # round through float64)
                sums = np.zeros(len(nk), dtype=np.int64)
                np.add.at(sums, di, contrib)
                nz = np.nonzero(sums)[0]
                return pa.table(
                    {
                        "i": pa.array(nz.astype(np.int64), type=pa.int64()),
                        "s": pa.array(sums[nz], type=pa.int64()),
                    }
                )

            acc = np.zeros(n, dtype=np.int64)
            for b in edges.map_batches(step, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            ):
                if b.num_rows:
                    np.add.at(acc, b["i"].to_numpy(zero_copy_only=False), b["s"].to_numpy(zero_copy_only=False))
            rank = teleport + acc
        return pa.table(
            {"node": pa.array(nodes, type=pa.int64()), "rank_units": pa.array(rank, type=pa.int64())}
        )

    # ---- all-distributed plan: ranks live in a Dataset; each round is an
    # edges⋈ranks hash join + groupby-sum + teleport zero-fill
    nodes_ds = (
        deg_partials.groupby("node").aggregate(Sum("outdeg", alias_name="outdeg")).materialize()
    )
    n = nodes_ds.count()
    teleport = (SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n
    r0 = SCALE // n

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rnode": t["node"],
                "rank_units": pa.array(np.full(len(t), r0, dtype=np.int64), type=pa.int64()),
                "outdeg": t["outdeg"],
            }
        )

    ranks = nodes_ds.map_batches(init_ranks, batch_format="pyarrow").materialize()
    parts = adaptive_partitions(n_edges)
    for _ in range(iters):
        contribs = safe_join(edges, ranks, num_partitions=parts, on=("src",), right_on=("rnode",))

        def contrib(t: pa.Table) -> pa.Table:
            r = t["rank_units"].to_numpy(zero_copy_only=False)
            d = t["outdeg"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"dst": t["dst"], "c": pa.array(r * DAMP_NUM // DAMP_DEN // d, type=pa.int64())}
            )

        sums = (
            contribs.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
        )
        joined = safe_join(
            nodes_ds,
            sums,
            num_partitions=parts,
            join_type="left_outer",
            on=("node",),
            right_on=("dst",),
            right_fill_schema={"c": pa.int64()},
        )

        def finish(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # the outer join nulls (no-inedge nodes) fill to 0 contribution
            c = pc.fill_null(pc.cast(t["c"], pa.int64()), 0).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "rnode": t["node"],
                    "rank_units": pa.array(teleport + c, type=pa.int64()),
                    "outdeg": t["outdeg"],
                }
            )

        ranks = joined.map_batches(finish, batch_format="pyarrow").materialize()

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["rnode"], "rank_units": t["rank_units"]})

    return ranks.map_batches(out, batch_format="pyarrow")


def g_components(sf_dir: str, driver_edge_threshold: int | None = None):
    """Connected components of the undirected purchase graph: (node,
    component) with component = min node id reachable — the flagship's
    transitive-clustering kernel applied to an explicit edge table."""
    from ..config import ClusteringConfig
    from ..stages.clustering import propagate_labels

    edges = purchase_edges(sf_dir).materialize()

    def nodes_of(t: pa.Table) -> pa.Table:
        # the clustering stage's id-stream column name is doc_id
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [t["src"].combine_chunks().cast(pa.int64()), t["dst"].combine_chunks().cast(pa.int64())]
                )
            }
        )

    all_nodes = first_per_key(edges.map_batches(nodes_of, batch_format="pyarrow"), "doc_id")
    cfg = ClusteringConfig()
    labels = propagate_labels(
        edges, all_nodes, cfg, driver_edge_threshold=driver_edge_threshold
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["doc_id"], "component": t["cluster_id"]})

    return labels.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------------------------ oracles

_EDGES_CTE = f"""
edges AS (
  SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
-- subquery-distinct, NOT a top-level UNION: under WITH RECURSIVE DuckDB
-- parses a CTE whose body is "X UNION Y" as a recursive fixpoint CTE
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
params AS (SELECT COUNT(*) AS n FROM nodes)
"""


def _pagerank_sql(iters: int = 5) -> str:
    its = [f"r0 AS (SELECT node, {SCALE} // p.n AS r FROM nodes CROSS JOIN params p)"]
    for i in range(1, iters + 1):
        its.append(
            f"""r{i} AS (
  SELECT n0.node,
         CAST(({SCALE} * {DAMP_DEN - DAMP_NUM} // {DAMP_DEN}) // p.n
           + COALESCE(SUM(r.r * {DAMP_NUM} // {DAMP_DEN} // d.outdeg), 0) AS BIGINT) AS r
  FROM nodes n0
  CROSS JOIN params p
  LEFT JOIN edges e ON e.dst = n0.node
  LEFT JOIN r{i - 1} r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n0.node, p.n
)"""
        )
    return (
        "WITH "
        + _EDGES_CTE.strip().rstrip()
        + ",\n"
        + ",\n".join(its)
        + f"\nSELECT node, r AS rank_units FROM r{iters}"
    )


G_PAGERANK_SQL = _pagerank_sql(5)

G_COMPONENTS_SQL = f"""
WITH RECURSIVE
{_EDGES_CTE.strip().rstrip()},
bi AS (SELECT DISTINCT u, v FROM (SELECT src AS u, dst AS v FROM edges UNION ALL SELECT dst, src FROM edges)),
reach AS (
  SELECT u, v FROM bi
  UNION
  SELECT r.u, e.v FROM reach r JOIN bi e ON r.v = e.u
),
rep AS (SELECT u AS node, least(u, min(v)) AS comp FROM reach GROUP BY u)
SELECT n.node, coalesce(rep.comp, n.node) AS component
FROM nodes n LEFT JOIN rep ON rep.node = n.node
"""


COMMON_NEIGHBORS_TOPK = 25


def g_common_neighbors(sf_dir: str, k: int = COMMON_NEIGHBORS_TOPK):
    """Top-k supplier pairs by shared customers — the common-neighbors /
    co-citation primitive of link prediction, and the bipartite projection a
    web pipeline runs on (page, host) or (doc, entity) edge lists.  Plan:
    decode the distinct purchase edges back to (cust, supp), enumerate
    within-customer supplier pairs with the blocking stage's sorted-group
    kernel (one range shuffle; per-customer degree bounds the quadratic
    locally), combine counts per block (np.unique — the dense pair space
    collapses ~25x before the exchange), then ONE range sort over the
    (pair, c) partials with complete-group summing AND the per-block top-k
    fused into the same pass, ending in a tiny driver merge.  (The first
    version used groupby(pair).count(): 37 s at sf0.1 — 499,500 groups
    through Ray's ~13k-groups/s hash-aggregate finalizer, the exact
    bottleneck rayops.map_sorted_groups exists to avoid.)  Output
    (supp_a, supp_b, n_common), rank order (n desc, a, b)."""
    from ..rayops import map_sorted_groups
    from ..stages.blocking import sorted_group_pairs

    edges = purchase_edges(sf_dir)

    def decode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "block_key": pa.array(t["src"].to_numpy(zero_copy_only=False) >> 1, type=pa.int64()),
                "doc_id": pa.array(t["dst"].to_numpy(zero_copy_only=False) >> 1, type=pa.int64()),
            }
        )

    pairs = sorted_group_pairs(edges.map_batches(decode, batch_format="pyarrow"), unique=False)

    def pack_combine(t: pa.Table) -> pa.Table:
        a = t["left_id"].to_numpy(zero_copy_only=False)
        b = t["right_id"].to_numpy(zero_copy_only=False)
        u, c = np.unique(_pack_edges(a, b), return_counts=True)
        return pa.table(
            {"pair": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64), type=pa.int64())}
        )

    packed = pairs.map_batches(pack_combine, batch_format="pyarrow")

    def sum_and_topk(t: pa.Table) -> pa.Table:
        # complete pair groups: sum the partials, keep the block's top-k by
        # the SAME (n desc, pair asc) order as the driver merge
        p = t["pair"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(p, kind="stable")
        ps, cs = p[order], c[order]
        u, starts = np.unique(ps, return_index=True)
        tot = np.add.reduceat(cs, starts)
        sel = np.lexsort((u, -tot))[:k]
        return pa.table(
            {"pair": pa.array(u[sel], type=pa.int64()), "n_common": pa.array(tot[sel], type=pa.int64())}
        )

    empty = pa.table(
        {"pair": pa.array([], type=pa.int64()), "n_common": pa.array([], type=pa.int64())}
    )
    merged = map_sorted_groups(packed, "pair", sum_and_topk, empty).to_pandas()
    merged = merged.sort_values(["n_common", "pair"], ascending=[False, True]).head(k)
    pr = merged["pair"].to_numpy()
    return pa.table(
        {
            "supp_a": pa.array(pr >> EKEY_SHIFT, type=pa.int64()),
            "supp_b": pa.array(pr & ((1 << EKEY_SHIFT) - 1), type=pa.int64()),
            "n_common": pa.array(merged["n_common"].to_numpy(), type=pa.int64()),
        }
    )


G_COMMON_NEIGHBORS_SQL = f"""
WITH e AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
p AS (
  SELECT a.s AS supp_a, b.s AS supp_b
  FROM e a JOIN e b ON a.c = b.c AND a.s < b.s)
SELECT supp_a, supp_b, count(*) AS n_common
FROM p GROUP BY 1, 2
ORDER BY n_common DESC, supp_a, supp_b LIMIT {COMMON_NEIGHBORS_TOPK}
"""


# ------------------------------------------------------------ triangle count
# Triangles of the user co-activity graph (users sharing an active minute) —
# the clustering-coefficient / community-density primitive of graph curation
# (a web pipeline runs it on the host graph to find link farms: abnormal
# triangle density is the classic spam signal).  Algorithm: the "forward" /
# degree-oriented wedge count (Schank & Wagner 2005) — orient every edge from
# the lower (degree, id) endpoint to the higher, emit wedges only from each
# node's out-neighborhood (out-degree is O(sqrt(m))-bounded under this
# orientation, so no celebrity node explodes the wedge stream), and count
# wedges whose closing edge exists via one packed-key equi-join.  The count
# is orientation-invariant, so the DuckDB oracle uses the plain id-ordered
# 3-way self-join.


def triangles_on_edges(edges):
    """Count triangles of an undirected simple graph given as a Dataset of
    distinct (u, v) int64 edges with u < v.  Fully distributed: a node-keyed
    degree aggregate, two hash joins to attach endpoint degrees, a sorted-
    group wedge enumeration, and a packed-key semi-join; driver state is the
    final scalar."""
    import pandas as pd

    from ray.data.aggregate import Count

    from ..rayops import adaptive_partitions, collect_table, map_sorted_groups, safe_join

    # materialize the slim (u, v) stream ONCE: it feeds count(), the degree
    # aggregate and a join side — left lazy, the upstream pair enumeration
    # re-executes for each consumer (observed 3x at sf0.1)
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table({"n_triangles": pa.array([0], type=pa.int64())})
    nparts = adaptive_partitions(n_edges)

    def explode(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]), type=pa.int64())})

    deg = (
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()  # feeds BOTH endpoint joins — compute once
    )

    def _orient_arrays(u, v, du, dv) -> pa.Table:
        # src = lower (deg, id) endpoint; (u, du) vs (v, dv) with u < v always
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        ddst = np.where(u_first, dv, du)
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "ddst": pa.array(ddst, type=pa.int64()),
                "ekey": pa.array(_pack_edges(src, dst), type=pa.int64()),
            }
        )

    n_nodes = deg.count()
    if n_nodes <= NODE_BROADCAST_MAX_ROWS:
        # small-degree-table plan: broadcast the sorted (node, deg) arrays
        # (16 B/node) and attach endpoint degrees by searchsorted inside ONE
        # map — the two node-keyed hash joins cost 6.6 s at sf0.1 for a
        # 1,500-node degree table; this is ~0.3 s
        dt = collect_table(deg, empty_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]))
        nodes = dt["node"].to_numpy(zero_copy_only=False)
        degs = dt["deg"].to_numpy(zero_copy_only=False)
        order = np.argsort(nodes)
        dref = ray.put((nodes[order], degs[order]))

        def orient_bcast(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            nn, dd = ray.get(dref)
            return _orient_arrays(u, v, dd[np.searchsorted(nn, u)], dd[np.searchsorted(nn, v)])

        directed = edges.map_batches(orient_bcast, batch_format="pyarrow").materialize()
    else:
        # at-scale plan: attach endpoint degrees by two node-keyed hash joins
        ed_u = safe_join(
            edges,
            deg.map_batches(lambda t: t.rename_columns(["u", "deg_u"]), batch_format="pyarrow"),
            num_partitions=nparts,
            on=("u",),
            right_on=("u",),
        )
        ed = safe_join(
            ed_u,
            deg.map_batches(lambda t: t.rename_columns(["v", "deg_v"]), batch_format="pyarrow"),
            num_partitions=nparts,
            on=("v",),
            right_on=("v",),
        )

        def orient(t: pa.Table) -> pa.Table:
            return _orient_arrays(
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
                t["deg_u"].to_numpy(zero_copy_only=False),
                t["deg_v"].to_numpy(zero_copy_only=False),
            )

        directed = ed.map_batches(orient, batch_format="pyarrow").materialize()

    def _wedge_keys(t: pa.Table) -> np.ndarray:
        # complete src groups: ordered out-neighbor pairs (v ≺ w by (deg, id))
        # — the closing edge, if present, is oriented exactly v → w
        df = t.to_pandas().sort_values(["src", "ddst", "dst"])
        out = []
        for _, g in df.groupby("src", sort=False):
            d = g["dst"].to_numpy(dtype=np.int64)
            if len(d) < 2:
                continue
            i, j = np.triu_indices(len(d), k=1)
            out.append(_pack_edges(d[i], d[j]))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    if n_edges <= EDGE_BROADCAST_MAX_ROWS:
        # small-graph plan: broadcast the sorted ekey set (8 B/edge) and count
        # closing membership INSIDE the wedge pass — no wedge stream ever
        # materializes, no join
        ekeys = np.sort(
            collect_table(
                directed.select_columns(["ekey"]),
                empty_schema=pa.schema([("ekey", pa.int64())]),
            )["ekey"]
            .to_numpy(zero_copy_only=False)
        )
        eref = ray.put(ekeys)

        def wedge_close_count(t: pa.Table) -> pa.Table:
            w = _wedge_keys(t)
            if len(w) == 0:
                return pa.table({"n": pa.array([0], type=pa.int64())})
            ek = ray.get(eref)
            pos = np.searchsorted(ek, w)
            hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == w)
            return pa.table({"n": pa.array([int(hit.sum())], type=pa.int64())})

        parts = map_sorted_groups(
            directed, "src", wedge_close_count, pa.table({"n": pa.array([], type=pa.int64())})
        ).to_pandas()
        total = int(parts["n"].sum()) if not parts.empty else 0
        return pa.table({"n_triangles": pa.array([total], type=pa.int64())})

    # at-scale plan: the wedge stream joins the edge set on the packed key
    empty_wedges = pa.table({"ekey": pa.array([], type=pa.int64())})

    def wedges(t: pa.Table) -> pa.Table:
        w = _wedge_keys(t)
        if len(w) == 0:
            return empty_wedges
        return pa.table({"ekey": pa.array(w, type=pa.int64())})

    wedge_ds = map_sorted_groups(directed, "src", wedges, empty_wedges)
    closed = safe_join(
        wedge_ds,
        directed.select_columns(["ekey"]),
        num_partitions=nparts,
        on=("ekey",),
        right_on=("ekey",),
    )
    return pa.table({"n_triangles": pa.array([closed.count()], type=pa.int64())})


def coactivity_edges(sf_dir: str):
    """Distinct (u, v) user pairs active in the same MINUTE (u < v): events →
    (minute, user) keys, within-minute pair enumeration through the blocking
    stage's sorted-group kernel (dedups users per minute locally), then one
    global pair distinct (first_per_key on the packed key)."""
    from ..rayops import first_per_key
    from ..stages.blocking import sorted_group_pairs

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.cast(pc.floor_temporal(t["ts"], unit="minute"), pa.int64())
        return pa.table({"block_key": m, "doc_id": t["user_id"]})

    pairs = sorted_group_pairs(ev.map_batches(keys, batch_format="pyarrow"), unique=True)

    def pack(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pair": pa.array(
                    _pack_edges(
                        t["left_id"].to_numpy(zero_copy_only=False),
                        t["right_id"].to_numpy(zero_copy_only=False),
                    ),
                    type=pa.int64(),
                )
            }
        )

    def unpack(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(p >> EKEY_SHIFT, type=pa.int64()),
                "v": pa.array(p & ((1 << EKEY_SHIFT) - 1), type=pa.int64()),
            }
        )

    return first_per_key(
        pairs.map_batches(pack, batch_format="pyarrow"), "pair"
    ).map_batches(unpack, batch_format="pyarrow")


def g_triangles(sf_dir: str):
    """Triangle count of the same-minute user co-activity graph."""
    return triangles_on_edges(coactivity_edges(sf_dir))


G_TRIANGLES_SQL = """
WITH uh AS (SELECT DISTINCT user_id AS u, date_trunc('minute', ts) AS m FROM events),
e AS (SELECT DISTINCT a.u AS x, b.u AS y FROM uh a JOIN uh b ON a.m = b.m AND a.u < b.u)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
"""


def g_degree_hist(sf_dir: str):
    """Degree distribution of the co-activity graph — the power-law audit run
    before any per-node iteration (a heavy-tailed degree sequence is what
    makes naive wedge/pair enumeration explode; triangles_on_edges' (deg, id)
    orientation depends on knowing this shape).  Plan: one node-keyed count
    over the materialized edge stream, then the histogram itself is value-
    domain-sized (per-block combiners + driver merge).  Output (degree,
    n_nodes)."""
    from ray.data.aggregate import Count

    edges = coactivity_edges(sf_dir).materialize()

    def explode(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]), type=pa.int64())})

    deg = edges.map_batches(explode, batch_format="pyarrow").groupby("node").aggregate(
        Count(alias_name="deg")
    )

    def hist_part(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["deg"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"degree": pa.array(u, type=pa.int64()),
             "n_nodes": pa.array(c.astype(np.int64), type=pa.int64())}
        )

    p = deg.map_batches(hist_part, batch_format="pyarrow").to_pandas()
    if p.empty:
        return pa.table(
            {"degree": pa.array([], type=pa.int64()), "n_nodes": pa.array([], type=pa.int64())}
        )
    g = p.groupby("degree", sort=True)["n_nodes"].sum().reset_index()
    return pa.table(
        {"degree": pa.array(g["degree"].to_numpy(dtype=np.int64), type=pa.int64()),
         "n_nodes": pa.array(g["n_nodes"].to_numpy(dtype=np.int64), type=pa.int64())}
    )


G_DEGREE_HIST_SQL = """
WITH uh AS (SELECT DISTINCT user_id AS u, date_trunc('minute', ts) AS m FROM events),
e AS (SELECT DISTINCT a.u AS x, b.u AS y FROM uh a JOIN uh b ON a.m = b.m AND a.u < b.u),
d AS (SELECT node, count(*) AS degree FROM (
        SELECT x AS node FROM e UNION ALL SELECT y FROM e) GROUP BY node)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM d GROUP BY degree
"""


LPA_ROUNDS = 3


def lpa_on_edges(edges, rounds: int = LPA_ROUNDS, driver_edge_threshold: int = 5_000_000):
    """Synchronous label-propagation communities over distinct (u, v) edges:
    labels start as node ids; each round every node takes the SMALLEST label
    among the most frequent labels of its neighbors (undirected, no self
    vote) — fully deterministic, so a fixed round count is both the engine
    spec and the unrolled-CTE oracle.  Two size-gated plans (the clustering
    discipline): below ``driver_edge_threshold`` the slim edge list runs
    vectorized rounds on the driver; above it each round is ONE node-keyed
    label join + a packed (node, label) count + a ``head_k_per_key``
    (count DESC, label ASC, k=1) winner pass — all existing primitives.
    Output (node, community)."""
    from ray.data.aggregate import Sum

    from ..rayops import first_per_key, head_k_per_key

    n_edges = edges.count()
    empty = pa.table(
        {"node": pa.array([], type=pa.int64()), "community": pa.array([], type=pa.int64())}
    )
    if n_edges == 0:
        return empty

    if n_edges <= scale_gate(driver_edge_threshold):
        parts = [
            b for b in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow") if b.num_rows
        ]
        src = np.concatenate([b["u"].to_numpy(zero_copy_only=False) for b in parts]).astype(np.int64)
        dst = np.concatenate([b["v"].to_numpy(zero_copy_only=False) for b in parts]).astype(np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        ei = np.concatenate([si, di])  # receiving node (index)
        ej = np.concatenate([di, si])  # its neighbor (index)
        lab = nodes.copy()
        for _ in range(rounds):
            nl = lab[ej]
            order = np.lexsort((nl, ei))
            en, ln = ei[order], nl[order]
            new_grp = np.concatenate(([True], (en[1:] != en[:-1]) | (ln[1:] != ln[:-1])))
            starts = np.flatnonzero(new_grp)
            gnode, glab = en[starts], ln[starts]
            gcnt = np.diff(np.concatenate((starts, [len(en)])))
            o2 = np.lexsort((glab, -gcnt, gnode))
            gn, gl = gnode[o2], glab[o2]
            first = np.concatenate(([True], gn[1:] != gn[:-1]))
            nxt = lab.copy()
            nxt[gn[first]] = gl[first]
            lab = nxt
        return pa.table(
            {"node": pa.array(nodes, type=pa.int64()), "community": pa.array(lab, type=pa.int64())}
        )

    # ---- all-distributed rounds (the 100-TB plan)
    def bidir(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "nbr": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    nbrs = edges.map_batches(bidir, batch_format="pyarrow").materialize()
    nparts = adaptive_partitions(n_edges)
    labels = first_per_key(
        nbrs.map_batches(
            lambda t: pa.table({"lnode": t["node"], "lab": t["node"]}), batch_format="pyarrow"
        ),
        "lnode",
    ).materialize()
    for _ in range(rounds):
        joined = safe_join(nbrs, labels, num_partitions=nparts, on=("nbr",), right_on=("lnode",))

        def pack_counts(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            lab = t["lab"].to_numpy(zero_copy_only=False)
            pk = _pack_edges(node, lab)
            u, c = np.unique(pk, return_counts=True)
            return pa.table(
                {"pk": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64), type=pa.int64())}
            )

        counts = (
            joined.map_batches(pack_counts, batch_format="pyarrow")
            .groupby("pk")
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "lnode": pa.array(
                            t["pk"].to_numpy(zero_copy_only=False) >> EKEY_SHIFT, type=pa.int64()
                        ),
                        "lab": pa.array(
                            t["pk"].to_numpy(zero_copy_only=False) & ((1 << EKEY_SHIFT) - 1),
                            type=pa.int64(),
                        ),
                        "c": t["c"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
        labels = (
            head_k_per_key(counts, "lnode", ["c", "lab"], 1, descending=[True, False])
            .select_columns(["lnode", "lab"])
            .materialize()
        )
    return labels.map_batches(
        lambda t: pa.table({"node": t["lnode"], "community": t["lab"]}), batch_format="pyarrow"
    )


def g_lpa_communities(sf_dir: str):
    """Label-propagation communities of the same-minute co-activity graph —
    the DISTRIBUTED upgrade of the reference's in-memory community-detection
    options (networkx louvain/LPA,
    /root/reference/src/batch_parallel_classification.py:871-935)."""
    return lpa_on_edges(coactivity_edges(sf_dir).materialize())


def _lpa_sql(rounds: int = LPA_ROUNDS) -> str:
    body = [
        "WITH uh AS (SELECT DISTINCT user_id AS u, date_trunc('minute', ts) AS m FROM events),",
        "ed AS (SELECT DISTINCT a.u AS x, b.u AS y FROM uh a JOIN uh b ON a.m = b.m AND a.u < b.u),",
        "e AS (SELECT x AS node, y AS nbr FROM ed UNION ALL SELECT y, x FROM ed),",
        "l0 AS (SELECT DISTINCT node, node AS lab FROM e)",
    ]
    for r in range(1, rounds + 1):
        body.append(
            f""",
c{r} AS (SELECT e.node, l.lab, count(*) AS c
         FROM e JOIN l{r - 1} l ON l.node = e.nbr GROUP BY e.node, l.lab),
l{r} AS (SELECT node, lab FROM (
           SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
           FROM c{r}) WHERE rn = 1)"""
        )
    body.append(f"\nSELECT node, CAST(lab AS BIGINT) AS community FROM l{rounds}")
    return "\n".join(body)


G_LPA_SQL = _lpa_sql()
