"""Relational operator pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic operator surface — filtered aggregates,
broadcast joins, grouped statistics, top-k, windowed (tumbling) aggregation,
mode, z-score standardization, seeded splits — each with a DuckDB-checkable
oracle (driver correctness gate).  Reference analogs noted per function
(SURVEY.md §2.5-2.6 operator inventory).

Conventions:
- every aggregate/computed column is explicitly named to match the oracle SQL;
- reads prune columns at the source (``read_parquet(columns=[...])``);
- small dimension tables are broadcast via ``ray.put`` + per-batch lookup, not
  shuffled (guide: "broadcast small sides");
- nothing materializes the big tables driver-side; results are small aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..rayops import read_parquet_clean
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum
from ..config import scale_gate



def _round_cols(ds, spec: dict[str, int]):
    """Round float aggregate columns (both here and in the oracle SQL): distributed
    and DuckDB summation orders differ at ~1e-9 relative, which would break the
    driver's exact value-hash compare."""
    import pyarrow as pa

    def f(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            if name in spec:
                v = t[name].to_numpy(zero_copy_only=False).astype(np.float64)
                cols[name] = pa.array(np.round(v, spec[name]), type=pa.float64())
            else:
                cols[name] = t[name]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def _pq(sf_dir: str, name: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


def _per_key_pandas(ds, key_col: str, per_group, empty: pa.Table):
    """Per-group pandas transform via ``rayops.map_sorted_groups``: ONE range
    sort makes each key's rows contiguous, then each sorted block runs
    ``per_group`` over the complete groups it owns — no hash shuffle, and no
    hash-aggregate finalizer (which runs at ~10-15k groups/s in this Ray
    version; at 10^8 users that finalizer alone is hours).  ``empty`` pins the
    output schema; every task's output is cast to it so block schemas agree.
    Partitioning assumption (unchanged from the groupby().map_groups plan it
    replaces): one key's rows fit in one task — salt hot keys at web scale."""
    from ..rayops import map_sorted_groups

    def fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        parts = [per_group(g) for _, g in df.groupby(key_col, sort=False)]
        if not parts:
            return empty
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out, schema=empty.schema, preserve_index=False)

    return map_sorted_groups(ds, key_col, fn, empty)


# --------------------------------------------------------------------- aggregates


def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style filtered grouped aggregate (A1/A2-class, SURVEY §2.5)."""
    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        # price and discount are 2-decimal values, so the product is an EXACT
        # 4-decimal number: accumulate in integer 1e-4 units.  A float sum
        # lands exactly on .005 boundaries (observed at sf0.001) where
        # accumulation order — not math — decides the rounded cent; integer
        # units make the engine and the SQL oracle bit-identical.
        dp = t["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - t["l_discount"].to_numpy(zero_copy_only=False)
        )
        dp_units = np.round(dp * 10_000.0).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_units": pa.array(dp_units, type=pa.int64()),
            }
        )

    # combiner plan: the output has ~6 groups, so Ray's hash-aggregate fixed
    # cost (aggregator actors + finalize) dwarfs the work — per-batch partial
    # sums stream out of the workers and a tiny driver merge finishes
    keys = ["l_returnflag", "l_linestatus"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_units=("disc_units", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    parts = [
        b
        for b in ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .iter_batches(batch_size=1 << 20, batch_format="pandas")
    ]
    agg = (
        pd.concat(parts).groupby(keys, sort=False, as_index=False).sum()
        if parts
        else pd.DataFrame(columns=keys + ["sum_qty", "sum_base_price", "sum_disc_units", "count_order"])
    )
    agg["avg_qty"] = np.round(agg["sum_qty"] / agg["count_order"], 6)
    agg["avg_price"] = np.round(agg["sum_base_price"] / agg["count_order"], 4)
    agg["sum_base_price"] = np.round(agg["sum_base_price"], 2)
    # exact half-away-up from integer 1e-4 units to cents (positive sums)
    agg["sum_disc_price"] = (
        (agg["sum_disc_units"].astype(np.int64) + 50) // 100
    ).astype(np.float64) / 100.0
    agg = agg.drop(columns=["sum_disc_units"])
    agg["count_order"] = agg["count_order"].astype(np.int64)
    cols = keys + ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_price", "count_order"]
    return pa.Table.from_pandas(agg[cols], preserve_index=False)


# sum_disc_price accumulates in exact integer 1e-4 units with explicit
# half-away-up to cents (see q1_pricing_summary: a float sum lands exactly
# on .005 boundaries where accumulation order decides the rounded value)
Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       CAST(floor((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) / 100) AS BIGINT) / 100.0 AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q6_discount_revenue(sf_dir: str):
    """TPC-H-Q6-style scan-filter-sum: predicate pushdown + single global agg."""
    ds = _pq(sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1994-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.greater_equal(t["l_discount"], pa.scalar(0.02)),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        # exact integer 1e-4 units (price and discount are 2-decimal; see q1)
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) * t["l_discount"].to_numpy(
            zero_copy_only=False
        )
        units = np.round(rev * 10_000.0).astype(np.int64)
        return pa.table({"rev_units": pa.array(units, type=pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow").aggregate(Sum("rev_units", alias_name="units"))
    total = int(out["units"] or 0)
    return pa.table({"revenue": [float((total + 50) // 100) / 100.0]})


Q6_SQL = """
SELECT CAST(floor((sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) + 50) / 100) AS BIGINT) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_quantity < 24
"""


# --------------------------------------------------------------------- broadcast joins


def _lookup_payload(keys, values) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-key broadcast payload for vectorized searchsorted gathers."""
    k = np.asarray(keys, dtype=np.int64)
    v = np.asarray(values, dtype=object)
    order = np.argsort(k, kind="mergesort")
    return k[order], v[order]


def _gather(sorted_keys: np.ndarray, values: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized dict.get over a sorted-key payload (None where missing)."""
    keys = np.asarray(keys, dtype=np.int64)
    if len(sorted_keys) == 0:
        return np.full(len(keys), None, dtype=object)
    pos = np.clip(np.searchsorted(sorted_keys, keys), 0, len(sorted_keys) - 1)
    out = values[pos]
    missing = sorted_keys[pos] != keys
    if missing.any():
        out = out.copy()
        out[missing] = None
    return out


def q_segment_revenue(sf_dir: str):
    """orders ⋈ customer (broadcast dimension) → revenue per market segment
    (J1-class join, SURVEY §2.4; broadcast pattern per ray_guide)."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(_lookup_payload(cust["c_custkey"], cust["c_mktsegment"]))
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        sk, sv = ray.get(seg_ref)
        segs = _gather(sk, sv, t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"c_mktsegment": pa.array(segs, type=pa.string()), "o_totalprice": t["o_totalprice"]})

    out = (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
    )
    return _round_cols(out, {"revenue": 2})


Q_SEGMENT_SQL = """
SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_region_customers(sf_dir: str):
    """3-way dimension chain region⋈nation⋈customer via composed broadcast maps."""
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    rmap = dict(zip(region["r_regionkey"], region["r_name"]))
    nref = ray.put(
        _lookup_payload(
            nation["n_nationkey"],
            [rmap.get(int(r)) for r in nation["n_regionkey"]],  # tiny dimension (25 rows)
        )
    )
    cust = _pq(sf_dir, "customer", ["c_nationkey"])

    def attach(t: pa.Table) -> pa.Table:
        nk, nv = ray.get(nref)
        names = _gather(nk, nv, t["c_nationkey"].to_numpy(zero_copy_only=False))
        return pa.table({"r_name": pa.array(names, type=pa.string())})

    return cust.map_batches(attach, batch_format="pyarrow").groupby("r_name").aggregate(Count(alias_name="n_customers"))


Q_REGION_SQL = """
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_top_customers(sf_dir: str):
    """Grouped sum → broadcast-join names → global top-k (O2-class, SURVEY §2.6).
    Deterministic tiebreak (total_spent DESC, c_custkey ASC)."""
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spent = orders.groupby("o_custkey").aggregate(Sum("o_totalprice", alias_name="total_spent"))
    top = spent.sort(["total_spent", "o_custkey"], descending=[True, False]).limit(10).to_pandas()
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    merged = top.merge(cust, left_on="o_custkey", right_on="c_custkey")[["c_custkey", "c_name", "total_spent"]]
    merged["total_spent"] = merged["total_spent"].round(2)
    return pa.Table.from_pandas(merged.sort_values(["total_spent", "c_custkey"], ascending=[False, True]), preserve_index=False)


Q_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, round(total_spent, 2) AS total_spent
FROM (SELECT o_custkey, sum(o_totalprice) AS total_spent FROM orders GROUP BY o_custkey
      ORDER BY total_spent DESC, o_custkey LIMIT 10) t
JOIN customer ON o_custkey = c_custkey
ORDER BY total_spent DESC, c_custkey
"""


def q_supplier_nations(sf_dir: str):
    """Distinct set op: nations that have suppliers (SURVEY §2.7 union/unique)."""
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(_lookup_payload(nation["n_nationkey"], nation["n_name"]))
    supp = _pq(sf_dir, "supplier", ["s_nationkey"])

    def attach(t: pa.Table) -> pa.Table:
        nk, nv = ray.get(nref)
        names = _gather(nk, nv, t["s_nationkey"].to_numpy(zero_copy_only=False))
        return pa.table({"n_name": pa.array(names, type=pa.string())})

    uniq = supp.map_batches(attach, batch_format="pyarrow").unique("n_name")
    return pa.table({"n_name": pa.array(sorted(uniq), type=pa.string())})


Q_SUPPLIER_NATIONS_SQL = """
SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


# --------------------------------------------------------------------- temporal / windows


def q_orders_by_month(sf_dir: str):
    """Tumbling calendar-month aggregate (streaming-shaped groupby; ray_guide
    'streaming-shaped workloads')."""
    orders = _pq(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"month": pc.strftime(t["o_orderdate"], format="%Y-%m"), "o_totalprice": t["o_totalprice"]})

    out = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue"))
    )
    return _round_cols(out, {"revenue": 2})


Q_ORDERS_MONTH_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
"""


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type over the events stream table."""
    ev = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        # shuffle an int64 epoch-hour key, not a timestamp: slimmer sort key,
        # and Ray's sort-boundary sampling converts timestamp keys through
        # numpy (day-aligned samples infer datetime64[D] and warn on the way
        # back to Arrow)
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {
                "hour_us": pc.cast(hour, pa.int64()),
                "event_type": t["event_type"],
                "value": t["value"],
            }
        )

    agg = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour_us"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
    )

    def restore(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.cast(t["hour_us"], pa.timestamp("us")),
                "n_events": t["n_events"],
                "total_value": t["total_value"],
            }
        )

    out = agg.map_batches(restore, batch_format="pyarrow")
    return _round_cols(out, {"total_value": 6})


Q_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
"""


def q_user_stats(sf_dir: str):
    """Per-user event statistics (A4-class field stats)."""
    ev = _pq(sf_dir, "events", ["user_id", "value"])
    out = ev.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="total_value"),
        Max("value", alias_name="max_value"),
        Min("value", alias_name="min_value"),
    )
    return _round_cols(out, {"total_value": 6})


Q_USER_STATS_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value,
       max(value) AS max_value, min(value) AS min_value
FROM events GROUP BY user_id
"""


def q_events_mode(sf_dir: str):
    """Per-event-type modal user (A6 mode, /root/reference/src/batch_parallel_imputation.py:520-539).
    Deterministic tie-break: highest count, then lowest user_id.  Pre-aggregated
    (groupby pair counts) before the tiny per-group argmax."""
    ev = _pq(sf_dir, "events", ["event_type", "user_id"])
    pair_counts = ev.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "user_id"], ascending=[False, True])
        return g.head(1)[["event_type", "user_id", "c"]].rename(columns={"user_id": "modal_user", "c": "n"})

    return pair_counts.groupby("event_type").map_groups(pick, batch_format="pandas")


Q_EVENTS_MODE_SQL = """
SELECT event_type, user_id AS modal_user, c AS n
FROM (SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2)
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY c DESC, user_id) = 1
"""


# --------------------------------------------------------------------- misc operators


def q_part_brand_stats(sf_dir: str):
    """Grouped stats incl. exact distinct-count via two-level pre-aggregation
    (A4 'distinct count' without a per-group Python pass)."""
    part = _pq(sf_dir, "part", ["p_brand", "p_type", "p_retailprice", "p_size"])
    base = part.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
        Max("p_size", alias_name="max_size"),
    )
    distinct_types = (
        part.groupby(["p_brand", "p_type"])
        .aggregate(Count(alias_name="_c"))
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_types"))
    )
    b = base.to_pandas()
    b["avg_price"] = b["avg_price"].round(6)
    d = distinct_types.to_pandas()
    return pa.Table.from_pandas(b.merge(d, on="p_brand"), preserve_index=False)


Q_PART_BRAND_SQL = """
SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price, max(p_size) AS max_size,
       count(DISTINCT p_type) AS n_types
FROM part GROUP BY p_brand
"""


def q_filter_orders(sf_dir: str):
    """Vectorized predicate + projection (M4-class filter)."""
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["o_orderstatus"], "O"), pc.greater(t["o_totalprice"], 100000.0))
        t = t.filter(m)
        return t.select(["o_orderkey", "o_totalprice"])

    return orders.map_batches(f, batch_format="pyarrow")


Q_FILTER_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
"""


def q_zscore_chars(sf_dir: str):
    """Global standardization (A8 StandardScaler two-pass,
    /root/reference/src/batch_parallel_feature_engineering.py:890-967): aggregate
    mean/std → broadcast → vectorized transform.  Population std (ddof=0)."""
    docs = _pq(sf_dir, "documents", ["doc_id", "n_chars"])
    stats = docs.aggregate(Mean("n_chars", alias_name="mu"), Std("n_chars", ddof=0, alias_name="sd"))
    mu, sd = float(stats["mu"]), float(stats["sd"])

    def z(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"doc_id": t["doc_id"], "z": pa.array(np.round((v - mu) / sd, 6), type=pa.float64())}
        )

    return docs.map_batches(z, batch_format="pyarrow")


Q_ZSCORE_SQL = """
SELECT doc_id,
       round((n_chars - (SELECT avg(n_chars) FROM documents)) / (SELECT stddev_pop(n_chars) FROM documents), 6) AS z
FROM documents
"""


def q_split_counts(sf_dir: str):
    """Seeded 70/30 shuffle-split sizes (O5, /root/reference/src/batch_parallel_classification.py:396-430):
    the split itself is seed-deterministic; the oracle checks the partition sizes."""
    docs = _pq(sf_dir, "documents", ["doc_id"])
    shuffled = docs.random_shuffle(seed=42)
    train, test = shuffled.split_proportionately([0.7])
    return pa.table(
        {"split": ["test", "train"], "n": pa.array([test.count(), train.count()], type=pa.int64())}
    )


Q_SPLIT_SQL = """
SELECT 'test' AS split, count(*) - CAST(floor(count(*) * 0.7) AS BIGINT) AS n FROM documents
UNION ALL
SELECT 'train' AS split, CAST(floor(count(*) * 0.7) AS BIGINT) AS n FROM documents
"""


# --------------------------------------------------------------------- custom operators
# (operators the Dataset API lacks — composed from one range sort +
# boundary-aware complete-group tasks (_per_key_pandas/map_sorted_groups), per
# the "custom operators" guidance; partitioning assumption: one user's events
# fit in one group)


def q_asof_join(sf_dir: str):
    """As-of join: for each 'click' event, the most recent 'purchase' by the
    same user strictly before it.  Implemented as a per-user sorted-group transform with
    ``pd.merge_asof`` over ts-sorted frames (the ray_guide as-of pattern);
    shuffle key: user_id.  Oracle: DuckDB ASOF JOIN."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values("ts")
        buys = g[g["event_type"] == "purchase"].sort_values("ts")
        if clicks.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"), "user_id": pd.Series(dtype="int64"),
                 "purchase_value": pd.Series(dtype="float64")}
            )
        merged = pd.merge_asof(
            clicks[["event_id", "user_id", "ts"]],
            buys[["ts", "value"]].rename(columns={"value": "purchase_value"}),
            on="ts",
            direction="backward",
            allow_exact_matches=False,
        )
        merged = merged[merged["purchase_value"].notna()]
        merged["purchase_value"] = merged["purchase_value"].round(6)
        return merged[["event_id", "user_id", "purchase_value"]]

    empty = pa.table(
        {"event_id": pa.array([], type=pa.int64()), "user_id": pa.array([], type=pa.int64()),
         "purchase_value": pa.array([], type=pa.float64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_ASOF_SQL = """
SELECT a.event_id, a.user_id, round(b.value, 6) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts > b.ts
"""


def q_json_props(sf_dir: str):
    """Semi-structured extraction: pull the integer field ``k`` out of the
    JSON ``props`` column and aggregate per event_type.  The extraction is a
    vectorized RE2 kernel (``pc.extract_regex``) — no per-row ``json.loads``
    in the hot path; for nested/irregular JSON the same stage swaps in a
    per-batch parser without touching the plan.  The web-pipeline analog is
    pulling fields out of WARC/WET metadata records at read time."""
    ev = _pq(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k"\s*:\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    out = (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"), Max("k", alias_name="max_k"))
    )
    return out


Q_JSON_PROPS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""


def q_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windows: per-user event runs split at inactivity gaps > 30 min
    (streaming-shaped; ray_guide session-window pattern — sort within group,
    cumulative gap marks).  Emits (user_id, session_start, n_events,
    total_value).  Oracle: gaps-and-islands SQL."""
    ev = _pq(sf_dir, "events", ["ts", "user_id", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # tie-safe without a secondary key: equal-ts rows have diff==0 (never
        # a session split) and every output is an order-insensitive aggregate
        g = g.sort_values("ts")
        new_sess = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        sid = new_sess.cumsum()
        out = g.groupby(sid).agg(
            session_start=("ts", "min"), n_events=("ts", "size"), total_value=("value", "sum")
        )
        out["user_id"] = g["user_id"].iloc[0]
        out["total_value"] = out["total_value"].round(6)
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_start", "n_events", "total_value"]].reset_index(drop=True)

    empty = pa.table(
        {"user_id": pa.array([], type=pa.int64()), "session_start": pa.array([], type=pa.timestamp("us")),
         "n_events": pa.array([], type=pa.int64()), "total_value": pa.array([], type=pa.float64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, sid
"""


def q_user_gaps(sf_dir: str):
    """Per-user inter-arrival gap statistics (LAG-window shape): events sorted
    by (ts, event_id) within user, gap = delta to the previous event in
    integer microseconds — exact at any accumulation order, so the engine and
    the window-SQL oracle hash-match bit for bit.  Emits (user_id, n_events,
    n_gaps, total_gap_us, max_gap_us); single-event users keep a 0/0 row."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = np.diff(us)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": np.int64(len(g)),
                "n_gaps": np.int64(len(gaps)),
                "total_gap_us": np.int64(gaps.sum()) if len(gaps) else np.int64(0),
                "max_gap_us": np.int64(gaps.max()) if len(gaps) else np.int64(0),
            }
        )

    empty = pa.table(
        {"user_id": pa.array([], type=pa.int64()), "n_events": pa.array([], type=pa.int64()),
         "n_gaps": pa.array([], type=pa.int64()), "total_gap_us": pa.array([], type=pa.int64()),
         "max_gap_us": pa.array([], type=pa.int64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_USER_GAPS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id,
       count(*) AS n_events,
       count(gap) AS n_gaps,
       CAST(coalesce(sum(gap), 0) AS BIGINT) AS total_gap_us,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id
"""


def q_lead_lag(sf_dir: str):
    """LAG/LEAD window shape: per event, the previous and next value of the
    same user ordered by (ts, event_id) — the navigation-function pair of the
    per-user family (same range-sort plan as q_running_total).  Run edges get
    the sentinel -1.0 (COALESCE'd identically in the oracle: a NaN-vs-NULL
    hash mismatch is impossible by construction).  Output
    (event_id, user_id, prev_value, next_value)."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").copy()
        g["prev_value"] = g["value"].shift(1).fillna(-1.0).round(6)
        g["next_value"] = g["value"].shift(-1).fillna(-1.0).round(6)
        return g[["event_id", "user_id", "prev_value", "next_value"]]

    empty = pa.table(
        {"event_id": pa.array([], type=pa.int64()), "user_id": pa.array([], type=pa.int64()),
         "prev_value": pa.array([], type=pa.float64()), "next_value": pa.array([], type=pa.float64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_LEAD_LAG_SQL = """
SELECT event_id, user_id,
       round(coalesce(lag(value)  OVER w, -1.0), 6) AS prev_value,
       round(coalesce(lead(value) OVER w, -1.0), 6) AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_running_total(sf_dir: str):
    """Windowed running aggregate per key (ray_guide per-group cumulative
    pattern): cumulative value per user ordered by ts — per-event output.
    Oracle: SQL window function."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # event_id as secondary key (stable mergesort): at duplicate (user, ts)
        # rows the cumulative value would otherwise depend on arbitrary sort
        # order and diverge from the oracle's window order
        g = g.sort_values(["ts", "event_id"], kind="mergesort").copy()
        g["running_value"] = g["value"].cumsum().round(6)
        return g[["event_id", "user_id", "running_value"]]

    empty = pa.table(
        {"event_id": pa.array([], type=pa.int64()), "user_id": pa.array([], type=pa.int64()),
         "running_value": pa.array([], type=pa.float64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_RUNNING_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 6) AS running_value
FROM events
"""


def q_window_join(sf_dir: str, window_seconds: int = 3600):
    """Windowed range join (feature generation): for each 'click' event, the
    number of same-user events in the preceding hour ``[ts - 1h, ts)``.  A
    range join Ray Data lacks — composed as a per-user sorted-group transform with two
    vectorized ``searchsorted`` sweeps over the ts-sorted group (O(n log n) per
    user, never the O(n²) pair blowup of a naive range join).  Shuffle key:
    user_id; partitioning assumption (as for q_asof_join/q_sessions): one
    user's events fit in one group — salt hot users at web scale."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    w = np.timedelta64(window_seconds, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        # strict upper bound at ts (side="left") drops the event itself and any
        # ts ties — exactly the oracle's b.ts < a.ts
        n_prior = np.searchsorted(ts, ts, side="left") - np.searchsorted(ts, ts - w, side="left")
        clicks = (g["event_type"] == "click").to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[clicks],
                "user_id": g["user_id"].to_numpy()[clicks],
                "n_prior": n_prior[clicks].astype("int64"),
            }
        )

    empty = pa.table(
        {"event_id": pa.array([], type=pa.int64()), "user_id": pa.array([], type=pa.int64()),
         "n_prior": pa.array([], type=pa.int64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_WINDOW_JOIN_SQL = """
SELECT a.event_id, a.user_id, count(b.event_id) AS n_prior
FROM (SELECT * FROM events WHERE event_type = 'click') a
LEFT JOIN events b
  ON a.user_id = b.user_id AND b.ts >= a.ts - INTERVAL 3600 SECOND AND b.ts < a.ts
GROUP BY a.event_id, a.user_id
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot(sf_dir: str):
    """Pivot (wide aggregate): per-user sum(value) per event type as its own
    column.  One vectorized pre-projection pass builds the per-type indicator
    columns, then a single groupby-sum shuffle covers every output column —
    not one scan/shuffle per type."""
    ev = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def project(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        cols = {"user_id": t["user_id"]}
        for ty in EVENT_TYPES:
            cols[f"sum_{ty}"] = pa.array(np.where(et == ty, val, 0.0), type=pa.float64())
        return pa.table(cols)

    agg = (
        ev.map_batches(project, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"sum_{ty}", alias_name=f"sum_{ty}") for ty in EVENT_TYPES])
    )

    def rnd(t: pa.Table) -> pa.Table:
        # np.round (scale-rint-divide), not pc.round: pyarrow's kernel lands a
        # last-ulp off DuckDB's round for some sums and breaks the value hash
        out = {"user_id": t["user_id"]}
        for ty in EVENT_TYPES:
            out[f"sum_{ty}"] = pa.array(
                np.round(t[f"sum_{ty}"].to_numpy(zero_copy_only=False), 6), type=pa.float64()
            )
        return pa.table(out)

    return agg.map_batches(rnd, batch_format="pyarrow")


_PIVOT_COLS = ",\n       ".join(
    f"round(sum(CASE WHEN event_type = '{ty}' THEN value ELSE 0 END), 6) AS sum_{ty}"
    for ty in EVENT_TYPES
)
Q_PIVOT_SQL = f"""
SELECT user_id,
       {_PIVOT_COLS}
FROM events GROUP BY user_id
"""


def q_unpivot(sf_dir: str):
    """Unpivot (wide → long): melt the pivot back to (user_id, event_type,
    total) rows — a vectorized per-batch explode, chained directly on the
    q_pivot Dataset (pivot → unpivot roundtrip in one streaming plan)."""
    wide = q_pivot(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        ids = t["user_id"].to_numpy(zero_copy_only=False)
        users, types, totals = [], [], []
        for ty in EVENT_TYPES:
            users.append(ids)
            types.append(np.full(len(ids), ty, dtype=object))
            totals.append(t[f"sum_{ty}"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(users), type=pa.int64()),
                "event_type": pa.array(np.concatenate(types), type=pa.string()),
                "total": pa.array(np.concatenate(totals), type=pa.float64()),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


Q_UNPIVOT_SQL = f"""
UNPIVOT ({Q_PIVOT_SQL.strip()})
ON {", ".join(f"sum_{ty} AS '{ty}'" for ty in EVENT_TYPES)}
INTO NAME event_type VALUE total
"""


def q_hopping(sf_dir: str):
    """Hopping (overlapping) windows: 2-hour windows sliding by 1 hour — each
    event lands in exactly two windows.  One vectorized pass emits both
    window_start keys (floor-to-hour and floor minus 1 h), then a single
    groupby covers count and sum; window cardinality stays bounded by the time
    span, never the event count."""
    ev = _pq(sf_dir, "events", ["ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        # int64 epoch-µs shuffle key (see q_events_hourly: slimmer, and avoids
        # Ray's numpy round-trip warning on day-aligned timestamp samples)
        w0 = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        w1 = pc.subtract(w0, pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table(
            {
                "window_us": pa.concat_arrays(
                    [w0.combine_chunks() if isinstance(w0, pa.ChunkedArray) else w0,
                     w1.combine_chunks() if isinstance(w1, pa.ChunkedArray) else w1]
                ),
                "value": pa.concat_arrays([t["value"].combine_chunks()] * 2),
            }
        )

    agg = (
        ev.map_batches(explode, batch_format="pyarrow")
        .groupby("window_us")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
    )

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.cast(t["window_us"], pa.timestamp("us")),
                "n_events": t["n_events"],
                "total_value": pa.array(
                    np.round(t["total_value"].to_numpy(zero_copy_only=False), 6), type=pa.float64()
                ),
            }
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


Q_HOPPING_SQL = """
SELECT window_start, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM (
  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         value
  FROM events)
GROUP BY window_start
"""


def q_top_events_per_user(sf_dir: str, k: int = 3):
    """Per-group top-k by value (rank, not head): row_number() OVER (PARTITION
    BY user ORDER BY value DESC, event_id) <= k via the distributed
    range-sort + boundary-aware ranking kernel (rayops.head_k_per_key) — no
    hash-aggregate over the group key."""
    from ..rayops import head_k_per_key

    ev = _pq(sf_dir, "events", ["event_id", "user_id", "value"])
    top = head_k_per_key(ev, "user_id", ["value", "event_id"], k, descending=[True, False])

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value": pa.array(
                    np.round(t["value"].to_numpy(zero_copy_only=False), 6), type=pa.float64()
                ),
            }
        )

    return top.map_batches(rnd, batch_format="pyarrow")


Q_TOP_EVENTS_SQL = """
SELECT event_id, user_id, round(value, 6) AS value FROM (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 3
"""


def q_customer_order_counts(sf_dir: str, broadcast_threshold_rows: int = 2_000_000):
    """LEFT OUTER join with zero-fill: per customer, the number of orders
    placed in 1995 — customers with none keep a 0 row.  Plan: filter + count
    the fact side first (shuffle carries one slim row per active customer),
    then left-outer hash-join the counts onto the dimension stream; the
    null-introduced float upcast on the count column is repaired by the
    coalesce-to-0 cast (Ray floats int64 columns when an outer join adds
    nulls)."""
    from ..rayops import adaptive_partitions, safe_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def in_1995(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        lo = pa.scalar(np.datetime64("1995-01-01", "us"), type=pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1996-01-01", "us"), type=pa.timestamp("us"))
        mask = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return pa.table({"o_custkey": t.filter(mask)["o_custkey"]})

    counts = (
        orders.map_batches(in_1995, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    n_cust = cust.count()
    if n_cust <= scale_gate(broadcast_threshold_rows):
        # broadcast plan: the aggregated side is one slim row per ACTIVE
        # customer — collect to sorted arrays, zero-fill via searchsorted in
        # the streaming customer map (a hash left_outer join costs seconds of
        # shuffle-actor overhead this lookup does in milliseconds)
        cdf = counts.to_pandas()
        keys = cdf["o_custkey"].to_numpy(dtype=np.int64) if len(cdf) else np.empty(0, np.int64)
        vals = cdf["n_orders"].to_numpy(dtype=np.int64) if len(cdf) else np.empty(0, np.int64)
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        ref = ray.put((keys, vals))

        def attach(t: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = np.zeros(len(ck), dtype=np.int64)
            if len(k):
                pos = np.searchsorted(k, ck)
                pos_c = np.clip(pos, 0, len(k) - 1)
                hit = k[pos_c] == ck
                n[hit] = v[pos_c[hit]]
            return pa.table(
                {
                    "c_custkey": pa.array(ck, type=pa.int64()),
                    "c_mktsegment": t["c_mktsegment"],
                    "n_orders": pa.array(n, type=pa.int64()),
                }
            )

        return cust.map_batches(attach, batch_format="pyarrow")

    joined = safe_join(
        cust,
        counts,
        num_partitions=adaptive_partitions(n_cust),
        on=("c_custkey",),
        right_on=("o_custkey",),
        join_type="left_outer",
        right_fill_schema={"n_orders": pa.int64()},
    )

    def fix(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.coalesce(t["n_orders"], pa.scalar(0)), pa.int64())
        return pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": n,
            }
        )

    return joined.map_batches(fix, batch_format="pyarrow")


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA", broadcast_threshold_rows: int = 2_000_000):
    """TPC-H Q5 (local supplier volume): revenue by nation for orders placed in
    1995 where customer and supplier sit in the same nation of one region.
    The 6-way join is planned Ray-native: region→nation→supplier/customer
    become three broadcast lookups (dimension maps, `ray.put` once), the only
    shuffle is the fact-fact lineitem⋈orders hash join on orderkey, and the
    final groupby ships one pre-aggregated row per nation per batch."""
    from ..rayops import adaptive_partitions, safe_join

    nat = _pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nation_name = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(nation_name)]
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nation_name)]
    maps_ref = ray.put(
        (
            dict(zip(sup["s_suppkey"].astype(np.int64), sup["s_nationkey"].astype(np.int64))),
            dict(zip(cust["c_custkey"].astype(np.int64), cust["c_nationkey"].astype(np.int64))),
            nation_name,
        )
    )

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        lo = pa.scalar(np.datetime64("1995-01-01", "us"), type=pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1996-01-01", "us"), type=pa.timestamp("us"))
        f = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        _, cmap, _ = ray.get(maps_ref)
        ck = f["o_custkey"].to_numpy(zero_copy_only=False)
        cn = pd.Series(ck).map(cmap)
        keep = cn.notna().to_numpy()
        return pa.table(
            {
                "o_orderkey": f["o_orderkey"].filter(pa.array(keep)),
                "c_nat": pa.array(cn[keep].astype(np.int64).to_numpy(), type=pa.int64()),
            }
        )

    o_f = orders.map_batches(o_filter, batch_format="pyarrow").materialize()
    n_orders_f = o_f.count()
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def partial_rev_cols(sk, ok_nat, price, disc):
        smap, _, nname = ray.get(maps_ref)
        sn = pd.Series(sk).map(smap)
        keep = sn.notna().to_numpy() & (sn.fillna(-1).to_numpy() == ok_nat)
        rev = price[keep] * (1.0 - disc[keep])
        nk = ok_nat[keep]
        out_n, out_r = [], []
        for key in np.unique(nk):
            out_n.append(nname[int(key)])
            out_r.append(rev[nk == key].sum())
        return pa.table(
            {"n_name": pa.array(out_n, type=pa.string()), "rev": pa.array(out_r, type=pa.float64())}
        )

    if n_orders_f <= scale_gate(broadcast_threshold_rows):
        # broadcast the slim filtered-orders map (orderkey -> customer nation):
        # one date window of a fact table is small; above the threshold the
        # hash-join plan below carries it
        odf = o_f.to_pandas()
        okeys = odf["o_orderkey"].to_numpy(dtype=np.int64) if len(odf) else np.empty(0, np.int64)
        onats = odf["c_nat"].to_numpy(dtype=np.int64) if len(odf) else np.empty(0, np.int64)
        order_ix = np.argsort(okeys)
        oref = ray.put((okeys[order_ix], onats[order_ix]))

        def partial_b(t: pa.Table) -> pa.Table:
            ok, on = ray.get(oref)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            nat_of = np.full(len(lk), -1, dtype=np.int64)
            if len(ok):
                pos = np.clip(np.searchsorted(ok, lk), 0, len(ok) - 1)
                hit = ok[pos] == lk
                nat_of[hit] = on[pos[hit]]
            m = nat_of >= 0
            return partial_rev_cols(
                t["l_suppkey"].to_numpy(zero_copy_only=False)[m],
                nat_of[m],
                t["l_extendedprice"].to_numpy(zero_copy_only=False)[m],
                t["l_discount"].to_numpy(zero_copy_only=False)[m],
            )

        partials = li.map_batches(partial_b, batch_format="pyarrow")
    else:
        joined = safe_join(
            li, o_f, num_partitions=adaptive_partitions(li.count()), on=("l_orderkey",), right_on=("o_orderkey",)
        )

        def partial_j(t: pa.Table) -> pa.Table:
            return partial_rev_cols(
                t["l_suppkey"].to_numpy(zero_copy_only=False),
                t["c_nat"].to_numpy(zero_copy_only=False),
                t["l_extendedprice"].to_numpy(zero_copy_only=False),
                t["l_discount"].to_numpy(zero_copy_only=False),
            )

        partials = joined.map_batches(partial_j, batch_format="pyarrow")

    agg = partials.groupby("n_name").aggregate(Sum("rev", alias_name="revenue"))

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t["n_name"],
                "revenue": pa.array(
                    np.round(t["revenue"].to_numpy(zero_copy_only=False), 6), type=pa.float64()
                ),
            }
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
GROUP BY n_name
"""


def q_rollup_events(sf_dir: str):
    """Multi-level ROLLUP aggregate: event counts and value sums at
    (event_type, hour), (event_type) and grand-total levels.  The coarser
    levels re-aggregate the FINEST level's partial sums — the distributed
    rollup pattern (one shuffle at the finest grain, driver-side re-reduction
    of the tiny aggregate table, never a second pass over the data)."""
    ev = _pq(sf_dir, "events", ["event_type", "ts", "value"])

    def project(t: pa.Table) -> pa.Table:
        # int64 epoch-µs shuffle key (see q_events_hourly)
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour_us": pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64()),
                "value": t["value"],
            }
        )

    base = (
        ev.map_batches(project, batch_format="pyarrow")
        .groupby(["event_type", "hour_us"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
    ).to_pandas()
    base["hour"] = pd.to_datetime(base.pop("hour_us"), unit="us")
    # rolled-up keys use explicit sentinels ('(all)' / epoch) on BOTH sides:
    # SQL NULLs would come back as NaT/None, and NaT never compares equal
    all_hour = pd.Timestamp("1970-01-01")
    lvl1 = base.copy()
    lvl2 = (
        base.groupby("event_type", as_index=False)
        .agg(n_events=("n_events", "sum"), total_value=("total_value", "sum"))
    )
    lvl2["hour"] = all_hour
    lvl3 = pd.DataFrame(
        {
            "event_type": ["(all)"],
            "hour": [all_hour],
            "n_events": [base["n_events"].sum()],
            "total_value": [base["total_value"].sum()],
        }
    )
    out = pd.concat([lvl1, lvl2, lvl3], ignore_index=True)[
        ["event_type", "hour", "n_events", "total_value"]
    ]
    out["n_events"] = out["n_events"].astype("int64")
    out["total_value"] = np.round(out["total_value"].astype(np.float64), 6)
    return pa.Table.from_pandas(out, preserve_index=False)


Q_ROLLUP_EVENTS_SQL = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(hour, TIMESTAMP '1970-01-01') AS hour,
       n_events, total_value
FROM (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*) AS n_events, round(sum(value), 6) AS total_value
  FROM events
  GROUP BY ROLLUP (event_type, hour))
"""


Q_CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, c.c_mktsegment, count(o.o_custkey) AS n_orders
FROM customer c LEFT JOIN (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01') o
ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
"""


def q_value_mad(sf_dir: str):
    """(n, median_value, mad): exact distributed median and median absolute
    deviation of ``events.value`` — two ``rayops.kth_by_sort`` passes (one
    range sort each, O(#blocks) driver ints; the robust-statistics shape that
    approximate sketches can't value-oracle).  Element selection follows
    DuckDB ``quantile_disc`` (index ceil(n/2) - 1), so both engines pick the
    IDENTICAL double and the abs-deviation pass subtracts the same constant."""
    from ..rayops import kth_by_sort

    ds = _pq(sf_dir, "events", ["value"])
    n = ds.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"n": pa.array([0], type=pa.int64()),
                      "median_value": pa.array([None], type=pa.float64()),
                      "mad": pa.array([None], type=pa.float64())})
        )
    k = max(int(np.ceil(n / 2)) - 1, 0)
    (med,) = kth_by_sort(ds, "value", [k])

    dev = ds.map_batches(
        lambda t: pa.table({"d": pc.abs(pc.subtract(t["value"], pa.scalar(med, type=pa.float64())))}),
        batch_format="pyarrow",
    )
    (mad,) = kth_by_sort(dev, "d", [k])
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "median_value": pa.array([round(float(med), 6)], type=pa.float64()),
                "mad": pa.array([round(float(mad), 6)], type=pa.float64()),
            }
        )
    )


Q_VALUE_MAD_SQL = """
WITH m AS (SELECT count(*) AS n, quantile_disc(value, 0.5) AS med FROM events)
SELECT m.n AS n,
       round(m.med, 6) AS median_value,
       round((SELECT quantile_disc(abs(e.value - m.med), 0.5) FROM events e), 6) AS mad
FROM m
"""


def q_anti_join(sf_dir: str, broadcast_threshold_rows: int = 2_000_000):
    """ANTI join: churned customers — no order on or after 1998-04-01.  Dual
    plan — below the threshold the distinct recent-o_custkey set broadcasts
    as one sorted array and the customer stream filters via searchsorted
    membership (no shuffle); above it, a left-outer join on the
    pre-aggregated keys with a null-filter (the shuffle anti-join)."""
    from ..rayops import adaptive_partitions, safe_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t["o_orderdate"], pa.scalar(pd.Timestamp("1998-04-01")))
        return pa.table({"o_custkey": t.filter(m)["o_custkey"]})

    keys = orders.map_batches(recent, batch_format="pyarrow").groupby("o_custkey").aggregate(
        Count(alias_name="n_o")
    )
    n_orders = orders.count()

    if n_orders <= scale_gate(broadcast_threshold_rows):
        kdf = keys.to_pandas()
        arr = np.sort(kdf["o_custkey"].to_numpy(dtype=np.int64)) if len(kdf) else np.empty(0, np.int64)
        ref = ray.put(arr)

        def keep(t: pa.Table) -> pa.Table:
            k = ray.get(ref)
            ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(k) == 0:
                return t
            pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
            return t.filter(pa.array(k[pos] != ck))

        return cust.map_batches(keep, batch_format="pyarrow")

    joined = safe_join(
        cust,
        keys,
        num_partitions=adaptive_partitions(n_orders),
        join_type="left_outer",
        on=("c_custkey",),
        right_on=("o_custkey",),
        right_fill_schema={"n_o": pa.int64()},
    )

    def null_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["n_o"])).select(["c_custkey", "c_mktsegment"])

    return joined.map_batches(null_only, batch_format="pyarrow")


Q_ANTI_JOIN_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-04-01')
"""


def q_value_histogram(sf_dir: str, buckets: int = 20):
    """Equi-width histogram of ``events.value``: global (min, max) in one
    aggregate pass, then per-batch fixed-size bincount partials merged on the
    driver (``buckets`` ints per block — constant-size state at any corpus
    size, the register-sketch shape).  Bucket math is the identical IEEE
    double expression in both engines, so assignments hash-match.  Emits only
    non-empty buckets: (bucket, n, lo_edge)."""
    # null values get no bucket (oracle: WHERE value IS NOT NULL); unguarded,
    # astype(float64) turns null into NaN whose floor() is an arbitrary bucket
    ds = _pq(sf_dir, "events", ["value"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["value"])), batch_format="pyarrow"
    )
    agg = ds.aggregate(Min("value"), Max("value"))
    if agg is None or agg.get("min(value)") is None:  # 0-row table
        return pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "lo_edge": pa.array([], type=pa.float64()),
            }
        )
    lo, hi = float(agg["min(value)"]), float(agg["max(value)"])
    if not np.isfinite(lo) or hi == lo:
        # degenerate domain: everything lands in bucket 0
        n = ds.count()
        return pa.table(
            {
                "bucket": pa.array([0] if n else [], type=pa.int64()),
                "n": pa.array([n] if n else [], type=pa.int64()),
                "lo_edge": pa.array([round(lo, 6)] if n else [], type=pa.float64()),
            }
        )
    w = (hi - lo) / float(buckets)

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(np.floor((v - lo) / w), buckets - 1).astype(np.int64)
        return pa.table({"reg": pa.array([np.bincount(b, minlength=buckets).astype(np.int64).tobytes()], type=pa.binary())})

    from ..rayops import reduce_registers

    counts = reduce_registers(
        ds.map_batches(partial, batch_format="pyarrow"), "reg", np.int64, np.add, buckets
    )
    nz = np.nonzero(counts)[0]
    return pa.table(
        {
            "bucket": pa.array(nz.astype(np.int64), type=pa.int64()),
            "n": pa.array(counts[nz], type=pa.int64()),
            "lo_edge": pa.array(np.round(lo + nz * w, 6), type=pa.float64()),
        }
    )


Q_VALUE_HISTOGRAM_SQL = """
WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
m AS (SELECT min(value) AS lo, (max(value) - min(value)) / 20.0 AS w FROM e),
b AS (SELECT CASE WHEN m.w = 0 THEN 0
             ELSE least(CAST(floor((value - m.lo) / m.w) AS BIGINT), 19) END AS bucket
      FROM e, m)
SELECT bucket, count(*) AS n,
       round((SELECT lo FROM m) + bucket * (SELECT w FROM m), 6) AS lo_edge
FROM b GROUP BY bucket
"""


def q_rolling_mean(sf_dir: str, window: int = 4):
    """Bounded window frame (ROWS 3 PRECEDING .. CURRENT ROW): per event, the
    rolling mean of the user's last ``window`` values ordered by
    (ts, event_id).  The frame complements the unbounded prefix of
    q_running_total; per-user state is O(window), the streaming-window shape."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").copy()
        g["rolling_value"] = g["value"].rolling(window, min_periods=1).mean().round(6)
        return g[["event_id", "user_id", "rolling_value"]]

    empty = pa.table(
        {"event_id": pa.array([], type=pa.int64()), "user_id": pa.array([], type=pa.int64()),
         "rolling_value": pa.array([], type=pa.float64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_ROLLING_MEAN_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rolling_value
FROM events
"""


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 6


def q_funnel(sf_dir: str):
    """Windowed funnel analysis (sequential pattern matching): per user, how
    far the ordered view → click → purchase sequence progresses through the
    event stream (ordered by ts, event_id), each step within
    ``FUNNEL_WINDOW_HOURS`` of the previous step's timestamp.  Greedy from
    the FIRST view, first qualifying match per step — the deterministic
    earliest-attempt semantics both engines replicate exactly.  Output
    (user_id, funnel_stage ∈ 0..3); per-user state is O(#steps), the
    streaming-sessionization shape."""
    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    win = pd.Timedelta(hours=FUNNEL_WINDOW_HOURS)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        types = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        pos = -1
        stage = 0
        prev_ts = None
        for step in FUNNEL_STEPS:
            ok = types == step
            idx = np.nonzero(ok)[0]
            idx = idx[idx > pos]
            if prev_ts is not None and len(idx):
                idx = idx[ts[idx] <= prev_ts + win]
            if len(idx) == 0:
                break
            pos = int(idx[0])
            prev_ts = ts[pos]
            stage += 1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "funnel_stage": np.int64(stage)})

    empty = pa.table(
        {"user_id": pa.array([], type=pa.int64()), "funnel_stage": pa.array([], type=pa.int64())}
    )
    return _per_key_pandas(ev, "user_id", per_user, empty)


Q_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
  FROM events),
s1 AS (SELECT user_id, min(pos) AS p1 FROM e WHERE event_type = 'view' GROUP BY user_id),
t1 AS (SELECT e.user_id, s1.p1, e.ts AS ts1 FROM e JOIN s1 ON e.user_id = s1.user_id AND e.pos = s1.p1),
s2 AS (SELECT e.user_id, min(pos) AS p2 FROM e JOIN t1 USING (user_id)
       WHERE event_type = 'click' AND pos > p1
         AND e.ts <= ts1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR GROUP BY e.user_id),
t2 AS (SELECT e.user_id, s2.p2, e.ts AS ts2 FROM e JOIN s2 ON e.user_id = s2.user_id AND e.pos = s2.p2),
s3 AS (SELECT e.user_id, min(pos) AS p3 FROM e JOIN t2 USING (user_id)
       WHERE event_type = 'purchase' AND pos > p2
         AND e.ts <= ts2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN p3 IS NOT NULL THEN 3 WHEN p2 IS NOT NULL THEN 2
                 WHEN p1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_stage
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_retention(sf_dir: str, broadcast_threshold_rows: int = 2_000_000):
    """Cohort retention matrix: users grouped by first-activity DAY
    (cohort_m = days since epoch, an integer both engines compute
    identically; the synthetic events span 30 days, so day is the natural
    cohort grain), counted in each subsequent active-day offset k.  Plan:
    distinct (user, day) pairs via ONE range shuffle (packed int64 key),
    per-user cohort via groupby-min, then the cohort table attaches back —
    broadcast sorted-array gather below the threshold, hash join above —
    and a tiny (cohort_m, k) groupby-count finishes.  Output
    (cohort_m, k, n_users)."""
    from ..rayops import adaptive_partitions, first_per_key, safe_join

    ev = _pq(sf_dir, "events", ["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        m = ts.astype(np.int64)  # days since epoch (DuckDB: date - DATE '1970-01-01')
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(m) and (
            int(m.min()) < 0 or int(m.max()) >= (1 << 20) or int(uid.max()) >= (1 << 43) or int(uid.min()) < 0
        ):
            raise ValueError("ts day or user_id exceeds the 20/43-bit packing bound; widen the pack")
        return pa.table({"pk": pa.array(uid * (1 << 20) + m, type=pa.int64())})

    am = first_per_key(ev.map_batches(pairs, batch_format="pyarrow"), "pk").map_batches(
        lambda t: pa.table(
            {
                "user_id": pa.array(t["pk"].to_numpy(zero_copy_only=False) >> 20, type=pa.int64()),
                "m": pa.array(t["pk"].to_numpy(zero_copy_only=False) & ((1 << 20) - 1), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    coh = am.groupby("user_id").aggregate(Min("m", alias_name="m0"))

    n_users = coh.count()
    if n_users <= scale_gate(broadcast_threshold_rows):
        cdf = coh.to_pandas()
        # empty-result frames lose their columns (Ray empty-block semantics)
        keys = cdf["user_id"].to_numpy(dtype=np.int64) if n_users else np.empty(0, np.int64)
        m0s = cdf["m0"].to_numpy(dtype=np.int64) if n_users else np.empty(0, np.int64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], m0s[order]))

        def attach(t: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(k, uid)  # every active user has a cohort
            m0 = v[pos]
            m = t["m"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cohort_m": pa.array(m0, type=pa.int64()),
                    "k": pa.array(m - m0, type=pa.int64()),
                }
            )

        attached = am.map_batches(attach, batch_format="pyarrow")
    else:
        joined = safe_join(
            am, coh, num_partitions=adaptive_partitions(n_users), on=("user_id",), right_on=("user_id",)
        )

        def diff(t: pa.Table) -> pa.Table:
            m = t["m"].to_numpy(zero_copy_only=False)
            m0 = t["m0"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"cohort_m": pa.array(m0, type=pa.int64()), "k": pa.array(m - m0, type=pa.int64())}
            )

        attached = joined.map_batches(diff, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cohort_m", "k"], sort=False, as_index=False).size().rename(columns={"size": "n_users"})

    parts = [
        b
        for b in attached.map_batches(partial, batch_format="pandas").iter_batches(
            batch_size=1 << 20, batch_format="pandas"
        )
        if len(b)
    ]
    if not parts:
        return pa.table(
            {
                "cohort_m": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
                "n_users": pa.array([], type=pa.int64()),
            }
        )
    agg = pd.concat(parts).groupby(["cohort_m", "k"], sort=True, as_index=False)["n_users"].sum()
    agg["n_users"] = agg["n_users"].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


Q_RETENTION_SQL = """
WITH am AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS m
  FROM events),
coh AS (SELECT user_id, min(m) AS m0 FROM am GROUP BY user_id)
SELECT coh.m0 AS cohort_m, CAST(am.m - coh.m0 AS BIGINT) AS k, count(*) AS n_users
FROM am JOIN coh USING (user_id) GROUP BY coh.m0, k
"""


def q_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate: 15-minute windows advancing every
    5 minutes, so each event lands in exactly 3 windows.  The streaming-window
    shape q_events_hourly's tumbling plan can't express: a vectorized ×3
    explode inside map_batches (repeat/tile on the epoch-second array, Arrow
    take for the key column) assigns the windows, then the same
    low-cardinality (type, window) hash aggregate.  Output
    (event_type, win_start epoch-sec, n_events, total_value)."""
    ev = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pa.Table:
        sec = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        base = (sec // 300) * 300
        n = len(sec)
        win = np.repeat(base, 3) - np.tile(np.array([0, 300, 600], dtype=np.int64), n)
        idx = np.repeat(np.arange(n, dtype=np.int64), 3)
        # exact integer micro-units (q1's fixed-point discipline): a float sum
        # is accumulation-order-dependent, an int64 sum is not; per-element
        # rounding is half-away-from-zero to match DuckDB round()
        v = t["value"].to_numpy(zero_copy_only=False) * 1e6
        vi = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pa.table(
            {
                "event_type": pc.take(t["event_type"], pa.array(idx)),
                "win_start": pa.array(win, type=pa.int64()),
                "value_u": pa.array(np.repeat(vi, 3), type=pa.int64()),
            }
        )

    agg = (
        ev.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "win_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_u", alias_name="total_u"))
    )

    def fin(t: pa.Table) -> pa.Table:
        total = t["total_u"].to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
        return pa.table(
            {
                "event_type": t["event_type"],
                "win_start": t["win_start"],
                "n_events": t["n_events"],
                "total_value": pa.array(total, type=pa.float64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


Q_HOPPING_WINDOW_SQL = """
WITH x AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS value_u,
         (CAST(epoch_us(ts) AS BIGINT) // 1000000 // 300) * 300 - 300 * j.j AS win_start
  FROM events, (SELECT unnest([0, 1, 2]) AS j) j)
SELECT event_type, win_start, count(*) AS n_events,
       CAST(sum(value_u) AS BIGINT) / 1000000.0 AS total_value
FROM x GROUP BY 1, 2
"""


def q_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP over (source, lang): doc count + char sum at
    leaf, per-source, and grand-total levels, with '<all>' markers.  Plan:
    ONE distributed leaf aggregate (the key space is #sources × #langs —
    tiny), then the parent levels derive from the leaf on the driver; the
    corpus is scanned exactly once and no second shuffle happens."""
    docs = _pq(sf_dir, "documents", ["source", "lang", "n_chars"])
    leaf = (
        docs.groupby(["source", "lang"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
    )
    by_src = leaf.groupby("source", as_index=False)[["n_docs", "sum_chars"]].sum()
    by_src["lang"] = "<all>"
    total = pd.DataFrame(
        {
            "source": ["<all>"],
            "lang": ["<all>"],
            "n_docs": [leaf["n_docs"].sum()],
            "sum_chars": [leaf["sum_chars"].sum()],
        }
    )
    out = pd.concat([leaf, by_src, total], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out[["source", "lang", "n_docs", "sum_chars"]]


Q_ROLLUP_SQL = """
SELECT CASE WHEN GROUPING(source) = 1 THEN '<all>' ELSE source END AS source,
       CASE WHEN GROUPING(lang) = 1 THEN '<all>' ELSE lang END AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(source, lang)
"""


NTILE_BUCKETS = 4


def q_ntile(sf_dir: str, k: int = NTILE_BUCKETS):
    """NTILE(k) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) — the
    equal-frequency bucketing window (quartile tags for length-balanced
    sampling).  Plan: the per-lang 0-based rank is a segmented exclusive
    prefix COUNT (rayops.keyed_exclusive_prefix_sum — one range sort,
    O(#blocks) driver carries), per-lang totals are a tiny aggregate, and
    the bucket index is pure integer arithmetic per row, so the whole
    assignment is exact at any scale.  Output (doc_id, lang, n_chars, tile)."""
    from ..rayops import keyed_exclusive_prefix_sum

    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(len(t), dtype=np.int64)))

    ranked = keyed_exclusive_prefix_sum(
        docs.map_batches(ones, batch_format="pyarrow"), "lang", ["n_chars", "doc_id"], "one", "rank0"
    )
    # per-lang row counts: lang is low-cardinality by nature — tiny aggregate
    totals = {r["lang"]: r["count()"] for r in docs.groupby("lang").count().take_all()}
    tref = ray.put(totals)

    def tile(t: pa.Table) -> pa.Table:
        tot = ray.get(tref)
        n = np.array([tot[x] for x in t["lang"].to_pylist()], dtype=np.int64)
        r = t["rank0"].to_numpy(zero_copy_only=False)
        q, rem = n // k, n % k
        big = rem * (q + 1)  # rows covered by the (q+1)-sized leading buckets
        b = np.where(r < big, r // np.maximum(q + 1, 1), rem + (r - big) // np.maximum(q, 1)) + 1
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "tile": pa.array(b.astype(np.int64), type=pa.int64()),
            }
        )

    return ranked.map_batches(tile, batch_format="pyarrow")


Q_NTILE_SQL = f"""
SELECT doc_id, lang, n_chars,
       CAST(ntile({NTILE_BUCKETS}) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


def q_corr(sf_dir: str):
    """Pearson correlation of line quantity vs (whole-dollar) extended price,
    in exact fixed-point ppm — the distributed-statistics pattern: the five
    moment sums (n, Σq, Σp, Σq², Σp², Σqp) are EXACT int64 per-block partials
    (bounds asserted) merged on the driver in arbitrary-precision Python ints,
    so no float accumulation order exists anywhere; the only float ops are
    one sqrt and one divide over those exact scalars, which IEEE-754 rounds
    identically in both engines, floored at 1e-6.  Output (n, r_ppm)."""
    li = _pq(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(np.int64)
        if len(q) and (int(q.max()) >= 1 << 20 or int(p.max()) >= 1 << 31):
            raise ValueError("moment inputs exceed the int64 partial-sum bound; rescale")
        return pa.table(
            {
                "n": pa.array([len(q)], type=pa.int64()),
                "sq": pa.array([int(q.sum())], type=pa.int64()),
                "sp": pa.array([int(p.sum())], type=pa.int64()),
                "sqq": pa.array([int((q * q).sum())], type=pa.int64()),
                "spp": pa.array([int((p * p).sum())], type=pa.int64()),
                "sqp": pa.array([int((q * p).sum())], type=pa.int64()),
            }
        )

    import math

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    # driver merge in python ints: the cross terms (n·Σp²) overflow int64 at
    # large sf, so arbitrary precision from here on — exactly DuckDB's HUGEINT
    # (an all-empty dataset's to_pandas() has NO columns — treat as all-zero)
    n, sq, sp, sqq, spp, sqp = (
        (int(parts[c].sum()) if c in parts.columns else 0)
        for c in ("n", "sq", "sp", "sqq", "spp", "sqp")
    )
    num = n * sqp - sq * sp
    den = math.sqrt(float((n * sqq - sq * sq) * (n * spp - sp * sp)))
    r_ppm = math.floor(float(num) / den * 1_000_000) if den > 0 else 0
    return pa.table(
        {"n": pa.array([n], type=pa.int64()), "r_ppm": pa.array([r_ppm], type=pa.int64())}
    )


Q_CORR_SQL = """
WITH m AS (
  SELECT count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sq,
         sum(CAST(floor(l_extendedprice) AS BIGINT)) AS sp,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq,
         sum(CAST(floor(l_extendedprice) AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS spp,
         sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice) AS BIGINT)) AS sqp
  FROM lineitem)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(n*sqp - sq*sp AS DOUBLE)
                  / sqrt(CAST((n*sqq - sq*sq) * (n*spp - sp*sp) AS DOUBLE)) * 1000000) AS BIGINT) AS r_ppm
FROM m
"""


def q_pivot_dow(sf_dir: str):
    """PIVOT: events as an (event_type × weekday) count matrix — the
    wide-format report shape (dashboards, spreadsheet exports).  Plan: ONE
    distributed (event_type, dow) aggregate — the key space is
    #types × 7, tiny — then the driver reshapes the aggregate table to wide;
    the corpus is scanned once and nothing row-cardinality leaves the
    cluster.  Output (event_type, dow0..dow6) with zero-filled gaps."""
    ev = _pq(sf_dir, "events", ["event_type", "ts"])

    def project(t: pa.Table) -> pa.Table:
        # DuckDB dayofweek: 0 = Sunday; Arrow day_of_week: 0 = Monday
        dow = pc.day_of_week(t["ts"], count_from_zero=True, week_start=7)
        return pa.table({"event_type": t["event_type"], "dow": pc.cast(dow, pa.int64())})

    agg = (
        ev.map_batches(project, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    cols = ["event_type"] + [f"dow{i}" for i in range(7)]
    if agg.empty:  # all-empty to_pandas() loses its columns
        return pa.table(
            {c: pa.array([], type=pa.string() if c == "event_type" else pa.int64()) for c in cols}
        )
    wide = (
        agg.pivot_table(index="event_type", columns="dow", values="n", fill_value=0, aggfunc="sum")
        .reindex(columns=range(7), fill_value=0)
        .reset_index()
    )
    wide.columns = ["event_type"] + [f"dow{i}" for i in range(7)]
    for c in wide.columns[1:]:
        wide[c] = wide[c].astype(np.int64)
    return pa.Table.from_pandas(wide.sort_values("event_type"), preserve_index=False)


Q_PIVOT_DOW_SQL = """
SELECT event_type,
       CAST(count(*) FILTER (dayofweek(ts) = 0) AS BIGINT) AS dow0,
       CAST(count(*) FILTER (dayofweek(ts) = 1) AS BIGINT) AS dow1,
       CAST(count(*) FILTER (dayofweek(ts) = 2) AS BIGINT) AS dow2,
       CAST(count(*) FILTER (dayofweek(ts) = 3) AS BIGINT) AS dow3,
       CAST(count(*) FILTER (dayofweek(ts) = 4) AS BIGINT) AS dow4,
       CAST(count(*) FILTER (dayofweek(ts) = 5) AS BIGINT) AS dow5,
       CAST(count(*) FILTER (dayofweek(ts) = 6) AS BIGINT) AS dow6
FROM events GROUP BY event_type
"""


def q_dau_wau(sf_dir: str):
    """DAU and trailing-7-day WAU per calendar day — the engagement telemetry
    of event pipelines, and a genuinely windowed DISTINCT (DuckDB cannot
    express count(DISTINCT) OVER; the oracle joins the day spine against
    user-days instead).  Plan: ONE distributed dedup to (user, day) — the
    corpus-sized step — then the day-spine join runs over the tiny
    user-day table (|users| × |days| worst case, dimension-sized), a
    7-day trailing window per spine day.  Output (day_us, dau, wau)."""
    from ..rayops import first_per_key

    DAY_US = 86_400_000_000
    ev = _pq(sf_dir, "events", ["ts", "user_id"])

    def keys(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        day = d.to_numpy(zero_copy_only=False) // DAY_US
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        if len(uid) and (int(uid.max()) >= 1 << 43 or int(uid.min()) < 0 or int(day.max()) >= 1 << 20 or int(day.min()) < 0):
            raise ValueError("user_id/day exceeds the 43/20-bit packing bound; widen the pack")
        return pa.table({"pk": pa.array(uid * (1 << 20) + day, type=pa.int64())})

    ud = first_per_key(ev.map_batches(keys, batch_format="pyarrow"), "pk").map_batches(
        lambda t: pa.table(
            {"day": pa.array(t["pk"].to_numpy(zero_copy_only=False) & ((1 << 20) - 1), type=pa.int64()),
             "user_id": pa.array(t["pk"].to_numpy(zero_copy_only=False) >> 20, type=pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    # user-day table is dimension-sized (|users| x |days|); the trailing
    # window is a python-int loop over the day spine on the driver
    if ud.empty:
        return pa.table({"day_us": pa.array([], type=pa.int64()),
                         "dau": pa.array([], type=pa.int64()),
                         "wau": pa.array([], type=pa.int64())})
    days = np.sort(ud["day"].unique())
    dau = ud.groupby("day")["user_id"].nunique()
    out_day, out_dau, out_wau = [], [], []
    for d in days:
        out_day.append(int(d) * DAY_US)
        out_dau.append(int(dau.loc[d]))
        win = ud[(ud["day"] >= d - 6) & (ud["day"] <= d)]
        out_wau.append(int(win["user_id"].nunique()))
    return pa.table(
        {"day_us": pa.array(out_day, type=pa.int64()),
         "dau": pa.array(out_dau, type=pa.int64()),
         "wau": pa.array(out_wau, type=pa.int64())}
    )


Q_DAU_WAU_SQL = """
WITH ud AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id FROM events),
spine AS (SELECT DISTINCT day FROM ud)
SELECT CAST(epoch_us(s.day) AS BIGINT) AS day_us,
       CAST(count(DISTINCT u.user_id) FILTER (u.day = s.day) AS BIGINT) AS dau,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM spine s JOIN ud u ON u.day <= s.day AND u.day >= s.day - INTERVAL 6 DAY
GROUP BY s.day
"""


def q_band_join(sf_dir: str, eps_cents: int = 10_000):
    """Numeric band (range) self-join WITHOUT pair materialization: for each
    order, the number of OTHER orders priced within ±$100.  The range join
    Ray Data lacks, on the scalable halo-bucket plan: bucket prices by the
    band width, emit each row to its own bucket (core) plus both neighbor
    buckets (halo), then ONE range shuffle (``map_sorted_groups`` on bucket)
    and two vectorized ``searchsorted`` sweeps per block — counts come off a
    sorted array, never an O(n·window) pair blowup.  Partitioning assumption:
    one price bucket's rows fit in one group; widen ``eps_cents``-relative
    bucket granularity (or sub-salt mega-buckets) if a single price point is
    corpus-hot.  Exact integer cents throughout.  Output (o_orderkey,
    n_close)."""
    from ..rayops import map_sorted_groups

    ods = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    eps = int(eps_cents)

    def explode(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = cents // eps
        bucket = np.concatenate([b, b - 1, b + 1])
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "cents": pa.array(np.tile(cents, 3), type=pa.int64()),
                "o_orderkey": pa.array(np.tile(ok, 3), type=pa.int64()),
                "core": pa.array(
                    np.concatenate([np.ones(len(ok), np.int8), np.zeros(2 * len(ok), np.int8)])
                ),
            }
        )

    def count_band(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        core = t["core"].to_numpy(zero_copy_only=False).astype(bool)
        # pk is monotone in (bucket, cents): rows of bucket g carry cents in
        # [(g-1)*eps, (g+2)*eps), so local = cents - (g-1)*eps ∈ [0, 3*eps)
        # and per-bucket pk ranges [4*eps*g, 4*eps*g + 3*eps) are disjoint —
        # global searchsorted answers every per-bucket range count at once.
        pk = b * (4 * eps) + (c - (b - 1) * eps)
        pks = np.sort(pk, kind="stable")
        qb, qc = b[core], c[core]
        base = qb * (4 * eps) + (qc - qb * eps)  # pk of (qb, qc - eps)
        n = (
            np.searchsorted(pks, base + 2 * eps, side="right")
            - np.searchsorted(pks, base, side="left")
            - 1
        )
        return pa.table(
            {
                "o_orderkey": pa.array(ok[core], type=pa.int64()),
                "n_close": pa.array(n, type=pa.int64()),
            }
        )

    empty = pa.table(
        {"o_orderkey": pa.array([], type=pa.int64()), "n_close": pa.array([], type=pa.int64())}
    )
    return map_sorted_groups(
        ods.map_batches(explode, batch_format="pyarrow"), "bucket", count_band, empty
    )


Q_BAND_JOIN_SQL = """
WITH c AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT a.o_orderkey, CAST(count(b.o_orderkey) AS BIGINT) AS n_close
FROM c a LEFT JOIN c b
  ON b.cents BETWEEN a.cents - 10000 AND a.cents + 10000 AND b.o_orderkey <> a.o_orderkey
GROUP BY a.o_orderkey
"""


def q_user_growth(sf_dir: str):
    """User growth curve: per calendar day, first-time users and the
    cumulative user count.  Plan: ONE range shuffle (``first_per_key`` on
    user_id ordered by day — the distributed min-day dedup), then per-block
    day-count partials (day-cardinality, dimension-sized) merge on the
    driver where the running total is a cumsum.  Days with no new users are
    absent in both engines by construction.  Output (day_us, new_users,
    cum_users)."""
    from ..rayops import first_per_key

    DAY_US = 86_400_000_000
    ev = _pq(sf_dir, "events", ["ts", "user_id"])

    def keys(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pa.array(d.to_numpy(zero_copy_only=False) // DAY_US, type=pa.int64()),
            }
        )

    firsts = first_per_key(ev.map_batches(keys, batch_format="pyarrow"), "user_id", order_col="day")

    def day_counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["day"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"day": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64), type=pa.int64())}
        )

    p = firsts.map_batches(day_counts, batch_format="pyarrow").to_pandas()
    if p.empty:
        return pa.table(
            {"day_us": pa.array([], type=pa.int64()), "new_users": pa.array([], type=pa.int64()),
             "cum_users": pa.array([], type=pa.int64())}
        )
    g = p.groupby("day", sort=True)["c"].sum()
    return pa.table(
        {
            "day_us": pa.array(g.index.to_numpy(dtype=np.int64) * DAY_US, type=pa.int64()),
            "new_users": pa.array(g.to_numpy(dtype=np.int64), type=pa.int64()),
            "cum_users": pa.array(np.cumsum(g.to_numpy(dtype=np.int64)), type=pa.int64()),
        }
    )


Q_USER_GROWTH_SQL = """
WITH f AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS d FROM events GROUP BY user_id),
nd AS (SELECT d, count(*) AS new_users FROM f GROUP BY d)
SELECT CAST(epoch_us(d) AS BIGINT) AS day_us,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
FROM nd
"""


def q_transition_counts(sf_dir: str):
    """Event-type transition (Markov) matrix: counts of consecutive
    (prev_type → event_type) pairs within each user's ts-ordered stream —
    the behavioral-model input of event pipelines.  Plan: per-user complete
    groups via ONE range sort (``map_sorted_groups``), vectorized shift
    inside the block, per-block (prev, cur) partials (≤ types² rows), tiny
    driver merge.  Ties on ts break by event_id, same as the oracle's
    window ORDER BY.  Output (prev_type, event_type, n_trans)."""
    from ..rayops import map_sorted_groups

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    empty = pa.table(
        {"prev_type": pa.array([], type=pa.string()), "event_type": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )

    def per_user(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        mask = prev.notna().to_numpy()
        if not mask.any():
            return empty
        sub = pd.DataFrame(
            {"prev_type": prev.to_numpy()[mask], "event_type": df["event_type"].to_numpy()[mask]}
        )
        g = sub.groupby(["prev_type", "event_type"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "prev_type": pa.array(g["prev_type"], type=pa.string()),
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    p = map_sorted_groups(ev, "user_id", per_user, empty).to_pandas()
    if p.empty:
        return pa.table(
            {"prev_type": pa.array([], type=pa.string()), "event_type": pa.array([], type=pa.string()),
             "n_trans": pa.array([], type=pa.int64())}
        )
    g = p.groupby(["prev_type", "event_type"], sort=True)["n"].sum().reset_index()
    return pa.table(
        {
            "prev_type": pa.array(g["prev_type"], type=pa.string()),
            "event_type": pa.array(g["event_type"], type=pa.string()),
            "n_trans": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


Q_TRANSITION_COUNTS_SQL = """
WITH w AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_trans
FROM w WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def q_user_fanout_hist(sf_dir: str):
    """Key fan-out histogram — the skew census an engine runs BEFORE keying a
    shuffle on user_id (a power-law key melts a hash exchange; this is the
    relational twin of t_lsh_bucket_stats): (events-per-user, n_users).
    Plan: per-user counts from complete groups of ONE range sort, then the
    histogram itself is value-domain-sized — per-block combiners and a tiny
    driver merge."""
    from ..rayops import map_sorted_groups

    ev = _pq(sf_dir, "events", ["user_id"])

    def per_user(t: pa.Table) -> pa.Table:
        _, c = np.unique(t["user_id"].to_numpy(zero_copy_only=False), return_counts=True)
        u, n = np.unique(c, return_counts=True)  # in-block histogram combine
        return pa.table(
            {"n_events": pa.array(u.astype(np.int64), type=pa.int64()),
             "n_users": pa.array(n.astype(np.int64), type=pa.int64())}
        )

    empty = pa.table(
        {"n_events": pa.array([], type=pa.int64()), "n_users": pa.array([], type=pa.int64())}
    )
    p = map_sorted_groups(ev, "user_id", per_user, empty).to_pandas()
    if p.empty:
        return empty  # 0-row to_pandas frames carry no columns
    g = p.groupby("n_events", sort=True)["n_users"].sum().reset_index()
    return pa.table(
        {
            "n_events": pa.array(g["n_events"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_users": pa.array(g["n_users"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


Q_USER_FANOUT_HIST_SQL = """
WITH pu AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
SELECT n_events, CAST(count(*) AS BIGINT) AS n_users
FROM pu GROUP BY n_events
"""


def q_rate_anomaly(sf_dir: str, window_minutes: int = 60, k_sigma: int = 3):
    """Streaming rate-anomaly flags: a minute is anomalous when its event
    count exceeds mean + 3σ of the trailing 60 observed minutes — the alert
    rule of ingest monitoring, in EXACT integer arithmetic so both engines
    agree bit-for-bit: (W·x − S)² > k²·(W·Q − S²) with S/Q the window's
    sum/sum-of-squares (the q_corr integer-moments trick applied to a
    sliding window).  Plan: per-minute counts via per-block combiners (the
    minute spine is dimension-sized — q_dau_wau's argument), rolling moments
    are two numpy cumsum diffs on the driver.  Output (minute_us, n_events,
    anomaly)."""
    MIN_US = 60_000_000
    ev = _pq(sf_dir, "events", ["ts"])

    def per_min(t: pa.Table) -> pa.Table:
        m = pc.cast(pc.floor_temporal(t["ts"], unit="minute"), pa.int64())
        u, c = np.unique(m.to_numpy(zero_copy_only=False) // MIN_US, return_counts=True)
        return pa.table(
            {"m": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64), type=pa.int64())}
        )

    p = ev.map_batches(per_min, batch_format="pyarrow").to_pandas()
    empty = pa.table(
        {"minute_us": pa.array([], type=pa.int64()), "n_events": pa.array([], type=pa.int64()),
         "anomaly": pa.array([], type=pa.int64())}
    )
    if p.empty:
        return empty
    g = p.groupby("m", sort=True)["c"].sum()
    x = g.to_numpy(dtype=np.int64)
    n = len(x)
    cs = np.concatenate(([0], np.cumsum(x)))
    cq = np.concatenate(([0], np.cumsum(x * x)))
    idx = np.arange(n)
    lo = np.maximum(idx - window_minutes, 0)  # trailing W observed minutes + current
    W = idx - lo + 1
    S = cs[idx + 1] - cs[lo]
    Q = cq[idx + 1] - cq[lo]
    lhs = W * x - S
    anom = (lhs > 0) & (lhs * lhs > k_sigma * k_sigma * (W * Q - S * S))
    return pa.table(
        {
            "minute_us": pa.array(g.index.to_numpy(dtype=np.int64) * MIN_US, type=pa.int64()),
            "n_events": pa.array(x, type=pa.int64()),
            "anomaly": pa.array(anom.astype(np.int64), type=pa.int64()),
        }
    )


Q_RATE_ANOMALY_SQL = """
WITH pm AS (SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m, count(*) AS x
            FROM events GROUP BY m),
w AS (SELECT m, x,
             count(*) OVER win AS wn,
             sum(x) OVER win AS s,
             sum(x * x) OVER win AS q
      FROM pm WINDOW win AS (ORDER BY m ROWS BETWEEN 60 PRECEDING AND CURRENT ROW))
SELECT CAST(epoch_us(m) AS BIGINT) AS minute_us,
       CAST(x AS BIGINT) AS n_events,
       CAST(CASE WHEN wn * x > s AND (wn * x - s) * (wn * x - s) > 9 * (wn * q - s * s)
                 THEN 1 ELSE 0 END AS BIGINT) AS anomaly
FROM w
"""


def q_fuzzy_name_pairs(sf_dir: str, max_dist: int = 2):
    """Fuzzy self-join on relational strings — near-identical part names
    (same brand, Levenshtein ≤ 2): the catalog-dedup / entity-linking shape
    over a dimension table, with FULL-recall banded blocking: dist ≤ 2
    implies |len(a)−len(b)| ≤ 2, so length buckets of width 2 with core+halo
    emission (the q_band_join trick keyed by (brand, len-bucket)) cannot
    miss a true pair; each candidate is generated exactly once (oriented
    from the lower (bucket, partkey) member) and verified with the
    vectorized integer edit-distance DP (DuckDB ``levenshtein`` parity).
    Output (left_partkey, right_partkey, lev_dist)."""
    from ..functions.similarity import levenshtein_dist_batch
    from ..rayops import map_sorted_groups

    parts_ds = _pq(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
    eps = int(max_dist)

    def explode(t: pa.Table) -> pa.Table:
        name = pc.utf8_lower(pc.fill_null(t["p_name"], ""))
        ln = pc.utf8_length(name).to_numpy(zero_copy_only=False).astype(np.int64)
        brand = pc.fill_null(t["p_brand"], "")
        # brand must partition groups globally: hash the brand STRING, not a
        # per-batch dictionary code
        from ..functions.hashing import md5_u64_dict

        bh = (md5_u64_dict(brand) >> np.uint64(16)).astype(np.int64)
        b = ln // max(eps, 1)
        gkey = bh * (1 << 16) + np.clip(b, 0, (1 << 14) - 1)
        rows = []
        for off, core in ((0, 1), (-1, 0), (1, 0)):
            rows.append(
                pa.table(
                    {
                        "gkey": pa.array(gkey + off, type=pa.int64()),
                        "bucket": pa.array(b, type=pa.int64()),
                        "p_partkey": t["p_partkey"],
                        "name": name,
                        "core": pa.array(np.full(len(ln), core, dtype=np.int8)),
                    }
                )
            )
        return pa.concat_tables(rows)

    empty = pa.table(
        {"left_partkey": pa.array([], type=pa.int64()), "right_partkey": pa.array([], type=pa.int64()),
         "lev_dist": pa.array([], type=pa.int64())}
    )

    def pairs_in_groups(t: pa.Table) -> pa.Table:
        from ..functions.similarity import _codepoint_matrix

        df = t.to_pandas()
        # bag-of-chars prefilter state, computed once per block: one edit
        # moves the character multiset by at most 2, so dist <= eps requires
        # L1(count vectors) <= 2*eps.  (On THIS corpus the gain is modest —
        # ~15.5s -> ~9s at sf0.1 — because p_names permute a tiny color
        # vocabulary, so distant pairs often share a char bag; on natural
        # strings the filter kills the candidate majority.)
        cm, _ = _codepoint_matrix(df["name"].to_numpy())
        pad = cm == 0
        buck32 = (cm % np.uint32(31)).astype(np.int64) + 1
        buck32[pad] = 0
        cnt = np.zeros((len(df), 32), dtype=np.int32)
        np.add.at(cnt, (np.arange(len(df))[:, None], buck32), (~pad).astype(np.int32))
        cnt[:, 0] = 0  # bucket 0 holds only padding
        df = df.reset_index(drop=True)

        la, lb, na, nb = [], [], [], []
        for _, g in df.groupby("gkey", sort=False):
            keys = g["p_partkey"].to_numpy(dtype=np.int64)
            names = g["name"].to_numpy()
            buck = g["bucket"].to_numpy(dtype=np.int64)
            core = g["core"].to_numpy(dtype=np.int8).astype(bool)
            gcnt = cnt[g.index.to_numpy()]
            n = len(keys)
            if n < 2 or not core.any():
                continue
            # orient from the lower (bucket, partkey) member, which is core in
            # this group by construction — each unordered pair generated once
            order = np.lexsort((keys, buck))
            keys, names, buck, core, gcnt = (
                keys[order], names[order], buck[order], core[order], gcnt[order]
            )
            ii, jj = np.triu_indices(n, k=1)
            keep = core[ii]
            ii, jj = ii[keep], jj[keep]
            if len(ii) == 0:
                continue
            l1 = np.abs(gcnt[ii] - gcnt[jj]).sum(axis=1)
            near = l1 <= 2 * eps
            ii, jj = ii[near], jj[near]
            if len(ii) == 0:
                continue
            la.append(keys[ii]); lb.append(keys[jj])
            na.append(names[ii]); nb.append(names[jj])
        if not la:
            return empty
        ka = np.concatenate(la); kb = np.concatenate(lb)
        d = levenshtein_dist_batch(np.concatenate(na), np.concatenate(nb))
        ok = d <= eps
        lo = np.minimum(ka[ok], kb[ok])
        hi = np.maximum(ka[ok], kb[ok])
        return pa.table(
            {"left_partkey": pa.array(lo, type=pa.int64()),
             "right_partkey": pa.array(hi, type=pa.int64()),
             "lev_dist": pa.array(d[ok], type=pa.int64())}
        )

    return map_sorted_groups(
        parts_ds.map_batches(explode, batch_format="pyarrow"), "gkey", pairs_in_groups, empty
    )


Q_FUZZY_NAME_PAIRS_SQL = """
SELECT least(a.p_partkey, b.p_partkey) AS left_partkey,
       greatest(a.p_partkey, b.p_partkey) AS right_partkey,
       CAST(levenshtein(lower(a.p_name), lower(b.p_name)) AS BIGINT) AS lev_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(lower(a.p_name), lower(b.p_name)) <= 2
"""


Q3_CUTOFF = "1998-06-15"
Q3_SEGMENT = "BUILDING"


Q3_CUST_BROADCAST_MAX = 20_000_000  # 8 B/key -> 160 MB at the cap


def q3_shipping_priority(sf_dir: str, k: int = 10, cust_broadcast_max: int | None = None):
    """TPC-H Q3 (shipping priority, adapted to this schema's columns): top-k
    unshipped orders of one market segment by discounted revenue.  Plan:
    the segment's customer-key set broadcasts into the orders filter when it
    fits (≤ ``Q3_CUST_BROADCAST_MAX`` keys), else a custkey semi-join does
    the filtering (the gated dual-plan discipline — a fifth of a 10^9-row
    customer dimension must not ship per task); then
    ONE orderkey hash join lineitem⋈filtered-orders, then
    per-order revenue sums + the top-k FUSED into one ``map_sorted_groups``
    pass (complete orderkey groups per block emit only their local top-k —
    the g_common_neighbors reduce shape, never an orders-cardinality hash
    aggregate), tiny driver merge.  Revenue in exact integer 1e-4 units with
    the q1 half-away-up cent rounding, so ordering is float-free.  Output
    (l_orderkey, revenue, o_orderdate_us, o_orderpriority)."""
    import ray as _ray

    from ..rayops import adaptive_partitions, collect_table, map_sorted_groups, safe_join

    cutoff = np.datetime64(Q3_CUTOFF).astype("datetime64[us]").astype(np.int64)
    bcast_max = Q3_CUST_BROADCAST_MAX if cust_broadcast_max is None else cust_broadcast_max

    cust_ds = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    seg_cust = cust_ds.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT)).select(["c_custkey"]),
        batch_format="pyarrow",
    ).materialize()
    n_seg = seg_cust.count()

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def date_proj(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        m = od < cutoff
        return pa.table(
            {
                "o_orderkey": pc.array_filter(t["o_orderkey"], pa.array(m)),
                "o_custkey": pc.array_filter(t["o_custkey"], pa.array(m)),
                "o_orderdate_us": pa.array(od[m], type=pa.int64()),
                "o_orderpriority": pc.array_filter(t["o_orderpriority"], pa.array(m)),
            }
        )

    dated = orders.map_batches(date_proj, batch_format="pyarrow")
    if n_seg <= bcast_max:
        keys = np.sort(
            collect_table(seg_cust, empty_schema=pa.schema([("c_custkey", pa.int64())]))["c_custkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        kref = _ray.put(keys)

        def seg_filter(t: pa.Table) -> pa.Table:
            ks = _ray.get(kref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, ck)
            m = (pos < len(ks)) & (ks[np.minimum(pos, max(len(ks) - 1, 0))] == ck) if len(ks) else np.zeros(len(ck), bool)
            return t.filter(pa.array(m)).drop_columns(["o_custkey"])

        fo = dated.map_batches(seg_filter, batch_format="pyarrow")
    else:
        fo = safe_join(
            dated,
            seg_cust,
            num_partitions=adaptive_partitions(n_seg),
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).map_batches(lambda t: t.drop_columns(["o_custkey"]), batch_format="pyarrow")

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def lfilter(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        m = sd > cutoff
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        dc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        units = np.round(ep * (1.0 - dc) * 10_000.0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pc.array_filter(t["l_orderkey"], pa.array(m)),
                "rev_units": pa.array(units, type=pa.int64()),
            }
        )

    fl = li.map_batches(lfilter, batch_format="pyarrow")
    joined = safe_join(
        fl, fo, num_partitions=adaptive_partitions(orders.count()), on=("l_orderkey",), right_on=("o_orderkey",)
    )

    empty = pa.table(
        {"l_orderkey": pa.array([], type=pa.int64()), "rev_units": pa.array([], type=pa.int64()),
         "o_orderdate_us": pa.array([], type=pa.int64()), "o_orderpriority": pa.array([], type=pa.string())}
    )

    def topk_orders(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.groupby(["l_orderkey", "o_orderdate_us", "o_orderpriority"], sort=False)["rev_units"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["rev_units", "o_orderdate_us", "l_orderkey"], ascending=[False, True, True], kind="mergesort"
        ).head(k)
        return pa.table(
            {
                "l_orderkey": pa.array(g["l_orderkey"].to_numpy(dtype=np.int64), type=pa.int64()),
                "rev_units": pa.array(g["rev_units"].to_numpy(dtype=np.int64), type=pa.int64()),
                "o_orderdate_us": pa.array(g["o_orderdate_us"].to_numpy(dtype=np.int64), type=pa.int64()),
                "o_orderpriority": pa.array(g["o_orderpriority"], type=pa.string()),
            }
        )

    parts = map_sorted_groups(joined, "l_orderkey", topk_orders, empty).to_pandas()
    if parts.empty:
        return empty
    top = parts.sort_values(
        ["rev_units", "o_orderdate_us", "l_orderkey"], ascending=[False, True, True], kind="mergesort"
    ).head(k)
    # exact half-away-up 1e-4 units -> cents -> dollars (the q1 discipline)
    rev = ((top["rev_units"].to_numpy(dtype=np.int64) + 50) // 100).astype(np.float64) / 100.0
    return pa.table(
        {
            "l_orderkey": pa.array(top["l_orderkey"].to_numpy(dtype=np.int64), type=pa.int64()),
            "revenue": pa.array(rev, type=pa.float64()),
            "o_orderdate_us": pa.array(top["o_orderdate_us"].to_numpy(dtype=np.int64), type=pa.int64()),
            "o_orderpriority": pa.array(top["o_orderpriority"], type=pa.string()),
        }
    )


Q3_SQL = f"""
SELECT l_orderkey,
       CAST(floor((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) / 100)
            AS BIGINT) / 100.0 AS revenue,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) DESC,
         o_orderdate, l_orderkey
LIMIT 10
"""


def q_percent_rank(sf_dir: str):
    """percent_rank of each order's price within its priority class, in exact
    integer ppm — the window-function family's cumulative-distribution member
    (RANK over big partitions), float-free on both engines:
    pr_ppm = (rank − 1) · 10⁶ // (n_partition − 1), rank = RANK() (ties share
    the lowest rank) over cents ascending.  Plan: ONE range sort on
    (priority, cents) via ``map_sorted_groups`` — complete priority groups
    per task, vectorized tie-aware ranking inside.  Output (o_orderkey,
    o_orderpriority, pr_ppm)."""
    from ..rayops import map_sorted_groups

    ods = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table(
            {"o_orderpriority": t["o_orderpriority"], "cents": pa.array(cents, type=pa.int64()),
             "o_orderkey": t["o_orderkey"]}
        )

    empty = pa.table(
        {"o_orderkey": pa.array([], type=pa.int64()), "o_orderpriority": pa.array([], type=pa.string()),
         "pr_ppm": pa.array([], type=pa.int64())}
    )

    def per_prio(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        outs = []
        for prio, g in df.groupby("o_orderpriority", sort=False):
            c = g["cents"].to_numpy()
            order = np.argsort(c, kind="mergesort")
            cs = c[order]
            n = len(cs)
            # RANK(): position of each value's FIRST occurrence, 1-based
            first = np.concatenate(([True], cs[1:] != cs[:-1]))
            rank_sorted = np.maximum.accumulate(np.where(first, np.arange(1, n + 1), 0))
            rank = np.empty(n, dtype=np.int64)
            rank[order] = rank_sorted
            pr = (rank - 1) * 1_000_000 // max(n - 1, 1)
            outs.append(
                pa.table(
                    {"o_orderkey": pa.array(g["o_orderkey"].to_numpy(dtype=np.int64), type=pa.int64()),
                     "o_orderpriority": pa.array([prio] * n, type=pa.string()),
                     "pr_ppm": pa.array(pr, type=pa.int64())}
                )
            )
        return pa.concat_tables(outs) if outs else empty

    return map_sorted_groups(ods.map_batches(prep, batch_format="pyarrow"), "o_orderpriority", per_prio, empty)


Q_PERCENT_RANK_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST((rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) - 1) * 1000000
            // greatest(count(*) OVER (PARTITION BY o_orderpriority) - 1, 1) AS BIGINT) AS pr_ppm
FROM orders
"""


def q_cube(sf_dir: str):
    """GROUP BY CUBE over (event_type, weekday): all four grouping sets —
    (type, dow), (type), (dow), grand total — completing the grouping-sets
    family next to q_rollup_events' ROLLUP.  Plan: per-block combiners to
    the FINEST grain (#types × 7 keys — dimension-sized), driver re-reduction
    into the coarser sets (the distributed cube pattern: one scan, never a
    second pass).  Sentinels: event_type '(all)', dow −1.  value sums in
    exact integer 1e-6 units divided once at the end, so both engines round
    identically.  Output (event_type, dow, n_events, total_value)."""
    ev = _pq(sf_dir, "events", ["event_type", "ts", "value"])

    def part(t: pa.Table) -> pa.Table:
        dow = pc.cast(
            pc.day_of_week(t["ts"], count_from_zero=True, week_start=7), pa.int64()
        ).to_numpy(zero_copy_only=False)
        vu = np.round(t["value"].to_numpy(zero_copy_only=False) * 1_000_000.0).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": t["event_type"].to_pylist(), "dow": dow, "vu": vu})
            .groupby(["event_type", "dow"], sort=False)
            .agg(n=("vu", "size"), v=("vu", "sum"))
            .reset_index()
        )
        return pa.table(
            {"event_type": pa.array(g["event_type"], type=pa.string()),
             "dow": pa.array(g["dow"].to_numpy(dtype=np.int64), type=pa.int64()),
             "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
             "v": pa.array(g["v"].to_numpy(dtype=np.int64), type=pa.int64())}
        )

    p = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    empty = pa.table(
        {"event_type": pa.array([], type=pa.string()), "dow": pa.array([], type=pa.int64()),
         "n_events": pa.array([], type=pa.int64()), "total_value": pa.array([], type=pa.float64())}
    )
    if p.empty:
        return empty
    fine = p.groupby(["event_type", "dow"], sort=True)[["n", "v"]].sum().reset_index()
    frames = [fine]
    by_type = fine.groupby("event_type", sort=True)[["n", "v"]].sum().reset_index().assign(dow=-1)
    by_dow = fine.groupby("dow", sort=True)[["n", "v"]].sum().reset_index().assign(event_type="(all)")
    total = pd.DataFrame(
        {"event_type": ["(all)"], "dow": [-1], "n": [fine["n"].sum()], "v": [fine["v"].sum()]}
    )
    out = pd.concat([fine, by_type, by_dow, total], ignore_index=True)
    return pa.table(
        {"event_type": pa.array(out["event_type"], type=pa.string()),
         "dow": pa.array(out["dow"].to_numpy(dtype=np.int64), type=pa.int64()),
         "n_events": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
         "total_value": pa.array(out["v"].to_numpy(dtype=np.int64) / 1_000_000.0, type=pa.float64())}
    )


Q_CUBE_SQL = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(dow, -1) AS dow,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(vu AS BIGINT) / 1000000.0 AS total_value
FROM (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         count(*) AS n_events,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS vu
  FROM events
  GROUP BY CUBE (event_type, CAST(dayofweek(ts) AS BIGINT)))
"""


def q_late_orders(sf_dir: str):
    """TPC-H-Q4-style correlated EXISTS across a join: orders placed in a
    6-month window that have at least one line shipped more than 30 days
    after the order date, counted by o_orderpriority.

    Scale plan: lineitem never ships its rows to the join — a per-batch
    partial max(l_shipdate) per l_orderkey feeds one groupby-Max shuffle
    (output is one slim int64 row per orderkey), the window-filtered orders
    join on that, and the EXISTS collapses to one vectorized timestamp
    compare.  The 5-group priority count finishes with per-batch combiners
    and a driver merge (hash-aggregate fixed cost dwarfs 5 groups — see
    q1_pricing_summary).  Reference analog: grouped order-level stats over
    joined pair/record tables (src/reporting.py)."""
    from ..rayops import adaptive_partitions, safe_join

    lo = pd.Timestamp("1994-01-01").value // 1000  # us
    hi = pd.Timestamp("1994-07-01").value // 1000
    grace_us = 30 * 86_400 * 1_000_000

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"l_orderkey": ok, "ship_us": sd}).groupby("l_orderkey", sort=False)[
            "ship_us"
        ].max()
        return pa.table(
            {
                "l_orderkey": pa.array(g.index.to_numpy(dtype=np.int64), type=pa.int64()),
                "ship_us": pa.array(g.to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    last_ship = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Max("ship_us", alias_name="max_ship_us"))
    )

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_window(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        m = (od >= lo) & (od < hi)
        return pa.table(
            {
                "o_orderkey": pc.array_filter(t["o_orderkey"], pa.array(m)),
                "o_orderdate_us": pa.array(od[m], type=pa.int64()),
                "o_orderpriority": pc.array_filter(t["o_orderpriority"], pa.array(m)),
            }
        )

    win = orders.map_batches(o_window, batch_format="pyarrow").materialize()
    empty = pa.table(
        {
            "o_orderpriority": pa.array([], type=pa.string()),
            "late_orders": pa.array([], type=pa.int64()),
        }
    )
    n_win = win.count()
    if n_win == 0:
        return empty
    joined = safe_join(
        win,
        last_ship,
        num_partitions=adaptive_partitions(n_win),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def late_counts(t: pa.Table) -> pa.Table:
        late = (
            t["max_ship_us"].to_numpy(zero_copy_only=False)
            > t["o_orderdate_us"].to_numpy(zero_copy_only=False) + grace_us
        )
        pr = pc.array_filter(t["o_orderpriority"], pa.array(late))
        vc = pc.value_counts(pr)
        return pa.table(
            {
                "o_orderpriority": vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    parts = joined.map_batches(late_counts, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return empty
    out = parts.groupby("o_orderpriority", sort=True)["n"].sum().reset_index()
    return pa.table(
        {
            "o_orderpriority": pa.array(out["o_orderpriority"], type=pa.string()),
            "late_orders": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


Q_LATE_ORDERS_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1994-01-01' AND o.o_orderdate < TIMESTAMP '1994-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q_intersect_users(sf_dir: str):
    """INTERSECT set op (SURVEY §2.7 family): users active in the corpus's
    first six hours AND its last six hours.

    Scale plan: instead of two scans + a distinct-merge, ONE scan emits
    per-batch (user_id, has_early, has_late) 0/1 partials (groupby-max inside
    the batch), a single groupby-Max shuffle ORs them globally, and a filter
    keeps users with both flags — combiner-friendly, one all-to-all, no
    row-level distinct materialization."""
    lo = pd.Timestamp("2024-01-01 06:00:00").value // 1000
    hi = pd.Timestamp("2024-01-30 18:00:00").value // 1000

    ev = _pq(sf_dir, "events", ["ts", "user_id"])

    def part(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        early = ts < lo
        late = ts >= hi
        keep = early | late
        if not keep.any():
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "has_early": pa.array([], type=pa.int64()),
                 "has_late": pa.array([], type=pa.int64())}
            )
        g = (
            pd.DataFrame(
                {"user_id": uid[keep],
                 "has_early": early[keep].astype(np.int64),
                 "has_late": late[keep].astype(np.int64)}
            )
            .groupby("user_id", sort=False)
            .max()
            .reset_index()
        )
        return pa.table(
            {"user_id": pa.array(g["user_id"].to_numpy(dtype=np.int64), type=pa.int64()),
             "has_early": pa.array(g["has_early"].to_numpy(dtype=np.int64), type=pa.int64()),
             "has_late": pa.array(g["has_late"].to_numpy(dtype=np.int64), type=pa.int64())}
        )

    agg = (
        ev.map_batches(part, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("has_early", alias_name="e"), Max("has_late", alias_name="l"))
    )

    def both(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64())})
        m = pc.and_(pc.equal(t["e"], pa.scalar(1)), pc.equal(t["l"], pa.scalar(1)))
        return pa.table({"user_id": pc.array_filter(t["user_id"], m)})

    out = agg.map_batches(both, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pa.table({"user_id": pa.array([], type=pa.int64())})
    return pa.table(
        {"user_id": pa.array(np.sort(out["user_id"].to_numpy(dtype=np.int64)), type=pa.int64())}
    )


Q_INTERSECT_USERS_SQL = """
SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-01 06:00:00'
INTERSECT
SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-30 18:00:00'
"""
