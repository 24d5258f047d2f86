"""Small Ray-Data utilities shared across stages."""

from __future__ import annotations

import numpy as np

import ray
import ray.data as rd


_DS_MEMO: dict = {}


def memo_dataset(key: tuple, builder):
    """Process-level memo of a MATERIALIZED Dataset keyed by ``key`` — sound
    because every cached plan reads immutable inputs (the testdata parquet is
    never rewritten within a run).  Used by queries that share an expensive
    intermediate (e.g. d_apply_fuzzy re-deriving d_minhash_pairs' verified pair
    set) so the driver's correctness sweep doesn't pay for it twice.  The Ray
    job id is part of the key: a re-``ray.init`` invalidates cached ObjectRefs,
    and a new job id self-invalidates the entry."""
    try:
        job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    except Exception:
        job = None
    full = (job, *key)
    ds = _DS_MEMO.get(full)
    if ds is None:
        ds = builder().materialize()
        _DS_MEMO[full] = ds
    return ds


def clear_dataset_memo() -> None:
    """Drop every memoized Dataset.  Benchmarks MUST call this before each
    timed sample — a memo hit measures the cache, not the pipeline."""
    _DS_MEMO.clear()


@ray.remote
def _block_num_rows(block) -> int:
    return block.num_rows


@ray.remote
def _group_meta_key(t, key_col: str):
    """(first_key, last_key, head_run_len, n_rows) of one sorted block."""
    import numpy as np

    if t.num_rows == 0:
        return None
    k = t[key_col].to_numpy(zero_copy_only=False)
    head_n = int(np.searchsorted(k, k[0], side="right"))
    return k[0], k[-1], head_n, int(t.num_rows)


@ray.remote
def _apply_group_fn(fn, t, drop_head: int, ext_take: list, *ext_tables):
    import pyarrow as pa

    parts = [t.slice(drop_head)] + [e.slice(0, n) for e, n in zip(ext_tables, ext_take)]
    return fn(pa.concat_tables(parts))


def map_sorted_groups(ds, key_col: str, fn, empty_result):
    """Per-group transform without a hash shuffle: range-sort by ``key_col``,
    then one task per sorted block applies ``fn`` to the COMPLETE groups that
    START in that block (groups straddling block boundaries are handed the
    continuation rows of following blocks — tiny slices, not a shuffle; the
    same discipline as blocking.sorted_group_pairs).  ``fn(table) → pa.Table``
    must handle several groups per call (rows arrive key-contiguous) and an
    arbitrary intra-group row order.  This replaces
    ``groupby(key).map_groups(fn)`` for row-cardinality keys, where Ray's
    hash-aggregate finalizer (~10-15k groups/s) dominates.  ``empty_result``
    pins the output schema when the input is empty."""
    import pyarrow as pa  # noqa: F401

    sorted_ds = ds.sort(key_col).materialize()
    refs = sorted_ds.to_arrow_refs()
    metas = ray.get([_group_meta_key.remote(r, key_col) for r in refs])
    live = [(r, m) for r, m in zip(refs, metas) if m is not None]
    out = []
    for i, (r, (first, last, head_n, n_rows)) in enumerate(live):
        prev_last = live[i - 1][1][1] if i > 0 else None
        drop_head = head_n if (prev_last is not None and first == prev_last) else 0
        if drop_head == n_rows:
            continue  # whole block belongs to a group owned by an earlier block
        ext_take: list[int] = []
        ext_tabs = []
        j = i + 1
        while j < len(live):
            jr, (jf, jl, jh, jn) = live[j]
            if jf != last:
                break
            ext_take.append(jh)
            ext_tabs.append(jr)
            if jh < jn:  # the group ends inside block j
                break
            j += 1  # block j is entirely this key — keep chaining
        out.append(_apply_group_fn.remote(fn, r, drop_head, ext_take, *ext_tabs))
    if not out:
        return rd.from_arrow(empty_result)
    return rd.from_arrow_refs(out)


@ray.remote
def _block_last_key(t, key_col: str):
    return t[key_col][-1].as_py() if t.num_rows else None


@ray.remote
def _block_first_per_key(t, key_col: str, prev_last, invert: bool = False):
    import numpy as np
    import pyarrow as pa

    if t.num_rows == 0:
        return t
    k = t[key_col].to_numpy(zero_copy_only=False)
    keep = np.ones(len(k), dtype=bool)
    keep[1:] = k[1:] != k[:-1]
    if prev_last is not None and k[0] == prev_last:
        keep[0] = False
    return t.filter(pa.array(~keep if invert else keep))


def first_per_key(ds, key_col: str, order_col: str | None = None, invert: bool = False):
    """One representative row per distinct ``key_col`` value, via range-sort +
    boundary-aware local first-wins (same plan as blocking.distinct_pairs —
    Ray's hash-aggregate finalizer is ~10-15k groups/s, far too slow for
    row-cardinality keys).  Without ``order_col``, which row represents a key
    is partition-dependent; callers must only rely on key-determined payloads
    (e.g. interning by content hash, where every row with the key carries
    identical content).  With ``order_col``, the sort is ``[key, order]`` and
    the representative is deterministically the min-``order_col`` row per key
    (e.g. exact dedup keeping the lowest doc_id).

    With ``invert=True`` the COMPLEMENT is returned — every row that is NOT
    its key's representative (the duplicate tail; with ``order_col`` these are
    deterministically all non-min rows per key).  Same single range shuffle."""
    sort_key = [key_col, order_col] if order_col else key_col
    sorted_ds = ds.sort(sort_key).materialize()
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    lasts = ray.get([_block_last_key.remote(r, key_col) for r in refs])
    prevs = [None]
    for l in lasts[:-1]:
        prevs.append(l if l is not None else prevs[-1])
    return rd.from_arrow_refs(
        [_block_first_per_key.remote(r, key_col, p, invert) for r, p in zip(refs, prevs)]
    )


@ray.remote
def _block_value_at(t, col: str, i: int):
    return t[col][i].as_py()


def reduce_registers(ds, col: str, dtype, op, width: int, fanin: int = 64):
    """Tree-reduce a Dataset of constant-size packed 'register' rows (HLL /
    Bloom / histogram partials: one binary cell of ``width`` ``dtype`` values
    per row) into ONE numpy array.  Each round merges up to ``fanin`` rows
    inside a map task, so the driver sees at most ``fanin`` blobs regardless
    of the number of input blocks — the piece that makes sketch pipelines
    100-TB-safe (a flat driver merge would stream #blocks × register-size
    through one process).  ``op`` is a binary numpy ufunc whose identity on
    non-negative registers is 0 (np.add, np.maximum, np.bitwise_or)."""

    def merge_batch(t):
        import numpy as _np
        import pyarrow as _pa

        blobs = t[col].to_pylist()
        if not blobs:
            return t
        acc = op.reduce(_np.stack([_np.frombuffer(b, dtype=dtype) for b in blobs]), axis=0)
        return _pa.table({col: _pa.array([acc.tobytes()], type=_pa.binary())})

    ds = ds.materialize()
    n = ds.count()
    while n > fanin:
        ds = ds.map_batches(merge_batch, batch_size=fanin, batch_format="pyarrow").materialize()
        n = ds.count()
    out = np.zeros(width, dtype=dtype)
    for t in ds.iter_batches(batch_format="pyarrow"):
        for blob in t[col].to_pylist():
            out = op(out, np.frombuffer(blob, dtype=dtype))
    return out


def kth_by_sort(ds, col: str, ks):
    """Exact k-th smallest values (0-based ranks ``ks``) of a numeric column,
    distributed: ONE range sort, the driver sees only per-block row counts
    (O(#blocks) ints) and fetches each target value from the block that owns
    its rank — never the column itself.  The building block for exact
    distributed quantiles over unbounded-domain columns (the bounded-domain
    histogram trick in sampling.q_lang_quantiles doesn't apply there)."""
    sorted_ds = ds.sort(col).materialize()
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    bounds = np.cumsum([0] + counts)
    n = int(bounds[-1])
    out = []
    for k in ks:
        if not 0 <= k < n:
            raise IndexError(f"rank {k} out of range for {n} rows")
        b = int(np.searchsorted(bounds, k, side="right") - 1)
        out.append(ray.get(_block_value_at.remote(refs[b], col, int(k - bounds[b]))))
    return out


def configure_context(*, quiet: bool = True) -> None:
    """Session-level DataContext setup for this engine.

    Besides quieting logs, this makes hash-shuffle aggregator ACTORS request
    fractional CPUs: by default each shuffle partition's aggregator reserves a
    full CPU, so a small session (1-2 CPUs) cannot co-schedule aggregators with
    map tasks and joins/groupbys stall.  Fractional reservations let the OS
    timeshare them — correct behavior, honest accounting.
    """
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n_cpus = 8
    if n_cpus <= 4:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.25


def read_parquet_clean(path, *, columns=None, **kw):
    """``read_parquet`` + schema-metadata strip (fused, zero-copy).

    Pandas-written parquet carries a ``pandas`` schema-metadata dict that makes
    ``pa.Schema`` UNHASHABLE — every downstream schema-dedup in Ray then warns
    "Failed to hash the schemas" and falls back to O(n) unification.  Stripping
    the metadata at the read fixes both."""

    def strip(t):
        return t.replace_schema_metadata(None)

    return rd.read_parquet(path, columns=columns, **kw).map_batches(
        strip, batch_format="pyarrow", batch_size=None
    )


def adaptive_partitions(n_rows: int, *, rows_per_partition: int = 200_000, cap: int = 64) -> int:
    """Partition count for hash shuffles/joins, bounded by BOTH data size and
    the CPU budget.  Each hash-shuffle partition is an aggregator ACTOR: more
    partitions than ~2x the cluster CPUs just thrashes the scheduler (observed:
    18 aggregators on a 2-CPU session stall a join for 20+ minutes)."""
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        n_cpus = 4
    by_data = n_rows // rows_per_partition + 2
    by_cpu = max(2, 2 * n_cpus)
    return max(2, min(cap, by_data, by_cpu))


def collect_table(ds, empty_schema: "pa.Schema | None" = None):
    """Concatenate a SMALL Dataset into one driver-side Arrow table.

    Hash-shuffle aggregates can emit empty blocks with an EMPTY (zero-column)
    schema; ``pa.concat_tables`` over the raw block list then fails with
    "Schema at index N was different".  Keep only row-bearing blocks (they
    always carry the real schema); if every block is empty, return the first
    schema-bearing one so consumers still see column names.  When EVERY block
    is empty AND zero-column, fall back to ``empty_schema`` (if given) so
    callers that index named columns get a correctly-typed empty table rather
    than a KeyError on ``pa.table({})``.
    """
    import pyarrow as pa

    tabs = ray.get(ds.to_arrow_refs())
    live = [t for t in tabs if t.num_rows > 0]
    if live:
        return pa.concat_tables(live)
    for t in tabs:
        if t.num_columns > 0:
            return t
    if empty_schema is not None:
        return empty_schema.empty_table()
    return pa.table({})


def drop_empty_blocks(ds):
    """Remove empty blocks from a Dataset.

    Ray's hash-shuffle aggregates and row filters can emit EMPTY blocks with an
    EMPTY schema; ``map_batches`` skips its UDF on empty blocks so they survive
    any number of transforms, and ``Dataset.join`` then fails inside pyarrow
    with "No match or multiple matches for key field ..." when such a block
    lands in a join partition.  This helper drops them at the block level —
    blocks stay in the object store (only row counts come to the driver).

    Triggers execution of ``ds`` (it must, to see the blocks) — use at join
    boundaries, which are barriers anyway.
    """
    return _live_blocks(ds)[0]


def _live_blocks(ds):
    """(dataset restricted to non-empty blocks, total row count)."""
    refs = ds.to_arrow_refs()
    if not refs:
        return ds, 0
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    total = int(sum(counts))
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if len(keep) == len(refs):
        return ds, total
    if not keep:
        # preserve one empty block so schema-bearing consumers still work
        return ds.limit(0), 0
    return rd.from_arrow_refs(keep), total


def safe_join(
    left,
    right,
    *,
    num_partitions: int,
    on: tuple,
    right_on: tuple,
    join_type: str = "inner",
    right_fill_schema: dict | None = None,
    **kw,
):
    """``Dataset.join`` with empty-block sanitization on both sides.

    A side that is empty END TO END is short-circuited: its surviving empty
    block carries the PRE-map schema (``map_batches`` never runs its UDF on
    empty blocks), so Acero would fail to find the join key in it.  For inner
    joins an empty side means an empty result — return the 0-row side
    unjoined (downstream ``map_batches`` skip it the same way).  For
    left_outer, an empty LEFT is an empty result; an empty RIGHT returns the
    bare left — pass ``right_fill_schema={"col": pa.type, ...}`` to have the
    expected right-side columns appended as all-null so the output schema is
    stable either way (callers that don't are on the hook for absent right
    columns, as q_customer_order_counts' coalesce pass is)."""
    assert join_type in ("inner", "left_outer"), "unsupported join type for empty-side shortcut"
    lds, ln = _live_blocks(left)
    rds, rn = _live_blocks(right)
    if ln == 0:
        return lds
    if rn == 0:
        if join_type != "left_outer":
            return rds
        if not right_fill_schema:
            return lds
        import pyarrow as pa

        fill = dict(right_fill_schema)

        def _append_nulls(t: "pa.Table") -> "pa.Table":
            for name, typ in fill.items():
                if name not in t.column_names:
                    t = t.append_column(name, pa.nulls(len(t), type=typ))
            return t

        return lds.map_batches(_append_nulls, batch_format="pyarrow")
    return lds.join(
        rds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
        **kw,
    )


def pack_matrix(mat) -> "pa.Array":
    """(n, w) fixed-width numpy matrix → fixed_size_binary(w*itemsize) column.

    Acero hash joins reject list-typed payload columns ("Data type
    fixed_size_list<...> is not supported in join non-key field") but accept
    binary — so fixed-width per-row payloads (MinHash signatures, dense
    vectors) are shipped through joins as raw bytes and reshaped zero-copy on
    the other side."""
    import numpy as np
    import pyarrow as pa

    mat = np.ascontiguousarray(mat)
    n, w = mat.shape
    nbytes = int(w * mat.dtype.itemsize)
    return pa.Array.from_buffers(pa.binary(nbytes), n, [None, pa.py_buffer(mat.tobytes())])


def unpack_matrix(col, dtype, width: int):
    """Inverse of pack_matrix: fixed_size_binary column → (n, width) matrix
    (zero-copy view of the Arrow buffer)."""
    import numpy as np
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, width), dtype=dtype)
    buf = arr.buffers()[1]
    a = np.frombuffer(buf, dtype=dtype).reshape(-1, width)
    return a[arr.offset : arr.offset + n]


def pack_ragged(arrays) -> "pa.Array":
    """List of 1-D fixed-width numpy arrays → variable binary column (one bytes
    blob per row), join-safe encoding for ragged per-row payloads (sparse
    vector indices/values, shingle-hash sets)."""
    import pyarrow as pa

    return pa.array([a.tobytes() for a in arrays], type=pa.binary())


def list_float_matrix(col, dtype="float64"):
    """(n, d) matrix from a list<float>/fixed_size_list<float> column via ONE
    list-flatten (zero-copy from the Arrow buffer, then a single vectorized
    dtype cast) — never per-row ``to_pylist``.  Rows must be uniform length
    and non-null (the embedding-column contract): ``flatten()`` silently DROPS
    null rows' values, which would misalign every subsequent row, so nulls and
    ragged rows are rejected explicitly rather than trusted to break the
    reshape (len(flat) can still divide n by accident)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = np.asarray(arr.flatten().to_numpy(zero_copy_only=False))
    if n == 0:
        return flat.astype(dtype, copy=False).reshape(0, 0)
    if arr.null_count:
        raise ValueError(f"list_float_matrix: {arr.null_count} null row(s) in embedding column")
    width = getattr(arr.type, "list_size", None)  # fixed_size_list carries it
    if width is None:
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        width = int(lens[0])
        if (lens != width).any():
            raise ValueError("list_float_matrix: ragged rows in embedding column")
    if len(flat) != n * width:
        raise ValueError(f"list_float_matrix: {len(flat)} values != {n} rows x {width}")
    return flat.astype(dtype, copy=False).reshape(n, width)


def pack_ragged_column(col, dtype) -> "pa.Array":
    """List-typed Arrow column → the same variable-binary encoding as
    ``pack_ragged``, built from ONE flat-buffer pass (list flatten + offset
    arithmetic) instead of per-row ``to_pylist`` materialization.  Null list
    rows pack as empty payloads (same semantics as the pylist path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    lc = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(lc)
    dtype = np.dtype(dtype)
    flat = lc.flatten().to_numpy(zero_copy_only=False)
    if flat.dtype != dtype:
        flat = flat.astype(dtype)
    lens = pc.fill_null(pc.list_value_length(lc), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    offs64 = np.concatenate([[0], np.cumsum(lens * dtype.itemsize)])
    if offs64[-1] > np.iinfo(np.int32).max:
        # int32 astype would WRAP silently and corrupt every slice boundary
        raise ValueError(
            f"pack_ragged_column: {offs64[-1]} payload bytes exceed the 2 GiB "
            "binary-offset limit — shrink batch_size for this stage"
        )
    offs = offs64.astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())]
    )


def unpack_ragged(col, dtype) -> list:
    """Inverse of pack_ragged: binary column → list of 1-D numpy arrays."""
    import numpy as np
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return [
        np.frombuffer(v, dtype=dtype) if v is not None else np.empty(0, dtype=dtype)
        for v in arr.to_numpy(zero_copy_only=False)
    ]


def attach_pair_sides(
    pairs_ds,
    side_ds,
    *,
    id_col: str,
    cols: tuple,
    num_partitions: int,
    left_key: str = "left_id",
    right_key: str = "right_id",
):
    """Enrich a slim pair table with per-id payload columns from ``side_ds`` —
    the at-scale pair-enrichment plan (two hash-partitioned joins, partitioning
    key = the id): pairs ⋈ side ON left_key, then ⋈ ON right_key.  Output has
    the original pair columns plus ``l_<col>`` / ``r_<col>`` payloads.  No
    driver-side materialization of the side table (contrast: a broadcast dict
    built via take_all caps out at object-store size — VERDICT r1 anti-pattern).
    """

    def prefixed(prefix: str):
        sel = [id_col] + list(cols)

        def ren(b):
            b = b.select(sel)
            return b.rename_columns([prefix + c for c in sel])

        return side_ds.map_batches(ren, batch_format="pyarrow")

    enriched = safe_join(
        pairs_ds,
        prefixed("l_"),
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=("l_" + id_col,),
    )
    return safe_join(
        enriched,
        prefixed("r_"),
        num_partitions=num_partitions,
        on=(right_key,),
        right_on=("r_" + id_col,),
    )


def actor_num_cpus() -> float:
    """CPU reservation per actor for map_batches actor pools: fractional on
    tiny sessions so a min-1 pool cannot deadlock a 1-CPU session (the pool's
    one actor + the upstream task must timeshare)."""
    try:
        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n = 8
    return 0.25 if n <= 2 else 1.0


def actor_pool_bounds(max_actors: int) -> tuple[int, int]:
    """(min, max) for map_batches actor pools.

    min ~= all-but-one session CPU: the autoscaler ramps too slowly for short
    stages (a 40-batch stage finishes before the pool grows past ~3 actors, so
    the stage runs at a third of the hardware).  Callers must feed actor-pool
    stages from MATERIALIZED inputs — a min-size pool that reserves nearly
    every CPU deadlocks any full-CPU upstream task sharing its execution."""
    try:
        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n = 8
    lo = max(1, min(max_actors, n - 1))
    return (lo, max(lo, max_actors))


@ray.remote
def _block_key_runs(t, key_col: str):
    """(first_key, last_key, n_rows, last_run_len) of a sorted block."""
    if t.num_rows == 0:
        return (None, None, 0, 0)
    import numpy as np

    k = t[key_col].to_numpy(zero_copy_only=False)
    change = np.nonzero(k[1:] != k[:-1])[0]
    last_run = len(k) - (int(change[-1]) + 1) if len(change) else len(k)
    return (k[0], k[-1], len(k), last_run)


@ray.remote
def _block_head_k(t, key_col: str, k: int, first_key_offset: int):
    """Keep rows whose within-key rank (global, sorted order) is < k.
    ``first_key_offset`` = rows of this block's first key in earlier blocks."""
    if t.num_rows == 0:
        return t
    import numpy as np
    import pyarrow as pa

    keys = t[key_col].to_numpy(zero_copy_only=False)
    starts = np.zeros(len(keys), dtype=bool)
    starts[0] = True
    starts[1:] = keys[1:] != keys[:-1]
    run_id = np.cumsum(starts) - 1
    run_start = np.flatnonzero(starts)
    rank = np.arange(len(keys)) - run_start[run_id]
    rank[run_id == 0] += first_key_offset
    return t.filter(pa.array(rank < k))


def head_k_per_key(ds, key_col: str, order_col, k: int, *, descending=None):
    """First ``k`` rows per key in (key, order) order — the per-host/source cap
    of web-crawl sampling (row_number() OVER (PARTITION BY key ORDER BY order)
    <= k), distributed: range-sort on (key, order) then boundary-aware local
    ranking.  Each block learns how many rows of its FIRST key precede it via
    a tiny O(#blocks) driver scan of per-block run summaries — keys spanning
    many blocks accumulate their offset through the carry, so no block ever
    sees more than its own rows.  Deterministic whenever (key, order) is
    unique.  ``order_col`` may be a list (with per-column ``descending``
    flags) for rank orders like (value DESC, id ASC) — top-k-per-group."""
    orders = [order_col] if isinstance(order_col, str) else list(order_col)
    desc = [False] * len(orders) if descending is None else list(descending)
    sorted_ds = ds.sort([key_col] + orders, descending=[False] + desc).materialize()
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    runs = ray.get([_block_key_runs.remote(r, key_col) for r in refs])
    offsets, carry_key, carry_n = [], None, 0
    for first_key, last_key, n_rows, last_run in runs:
        off = carry_n if (first_key is not None and first_key == carry_key) else 0
        offsets.append(off)
        if n_rows == 0:
            continue  # keep carry across empty blocks
        if first_key == last_key:
            carry_key, carry_n = last_key, off + n_rows
        else:
            carry_key, carry_n = last_key, last_run
    return rd.from_arrow_refs(
        [_block_head_k.remote(r, key_col, k, off) for r, off in zip(refs, offsets)]
    )


@ray.remote
def _block_i64_sum(t, col: str) -> int:
    if t.num_rows == 0:
        return 0
    import numpy as np

    return int(t[col].to_numpy(zero_copy_only=False).sum(dtype=np.int64))


@ray.remote
def _block_excl_prefix(t, col: str, out_col: str, offset: int):
    import numpy as np
    import pyarrow as pa

    if t.num_rows == 0:
        return t.append_column(out_col, pa.array([], type=pa.int64()))
    v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
    return t.append_column(out_col, pa.array(np.cumsum(v) - v + offset, type=pa.int64()))


def exclusive_prefix_sum(ds, order_col, val_col: str, out_col: str):
    """Global running total — ``sum(val) OVER (ORDER BY order ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` with no partition key — as the classic
    distributed scan: range-sort the slim rows, a first pass reducing each
    sorted block to ONE scalar sum (O(#blocks) driver state), a driver cumsum
    over those scalars, then one task per block writing local-cumsum + its
    block offset.  Two streaming passes; nothing corpus-sized ever leaves the
    workers.  ``order_col`` must be unique for a deterministic result (ties
    across block boundaries would make the prefix partition-dependent)."""
    import numpy as np
    import pyarrow as pa

    sorted_ds = ds.sort(order_col).materialize()
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        # keep the schema contract: the empty result still carries out_col
        schema = sorted_ds.schema()
        cols = {f.name: pa.array([], type=f.type) for f in (schema.base_schema if schema else [])}
        cols[out_col] = pa.array([], type=pa.int64())
        return rd.from_arrow(pa.table(cols))
    sums = ray.get([_block_i64_sum.remote(r, val_col) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(np.asarray(sums, dtype=np.int64))))[:-1]
    return rd.from_arrow_refs(
        [_block_excl_prefix.remote(r, val_col, out_col, int(o)) for r, o in zip(refs, offsets)]
    )


@ray.remote
def _block_keyed_sums(t, key_col: str, val_col: str):
    """(first_key, first_key_sum, last_key, last_key_sum) of a sorted block —
    the only state the segmented scan needs, because after a (key, order)
    range sort a key's rows are contiguous: interior keys never span blocks."""
    if t.num_rows == 0:
        return (None, 0, None, 0)
    import numpy as np

    k = t[key_col].to_numpy(zero_copy_only=False)
    v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    first_mask = k == k[0]
    last_mask = k == k[-1]
    return (k[0], int(v[first_mask].sum()), k[-1], int(v[last_mask].sum()))


@ray.remote
def _block_keyed_excl_prefix(t, key_col: str, val_col: str, out_col: str, carry: int):
    """Per-key exclusive cumsum within a sorted block + ``carry`` (the sum of
    this block's FIRST key in earlier blocks) added to its first-key rows."""
    import numpy as np
    import pyarrow as pa

    if t.num_rows == 0:
        return t.append_column(out_col, pa.array([], type=pa.int64()))
    k = t[key_col].to_numpy(zero_copy_only=False)
    v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.zeros(len(k), dtype=bool)
    starts[0] = True
    starts[1:] = k[1:] != k[:-1]
    cum = np.cumsum(v) - v  # exclusive running total, unsegmented
    run_start = np.flatnonzero(starts)
    run_id = np.cumsum(starts) - 1
    seg = cum - cum[run_start[run_id]]  # subtract each run's base → segmented
    seg[run_id == 0] += carry
    return t.append_column(out_col, pa.array(seg, type=pa.int64()))


def keyed_exclusive_prefix_sum(ds, key_col: str, order_col, val_col: str, out_col: str):
    """Segmented running total — ``sum(val) OVER (PARTITION BY key ORDER BY
    order ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`` — as one range sort on
    (key, order) plus the boundary-carry trick of head_k_per_key: each block
    only needs the accumulated sum of its FIRST key from earlier blocks (all
    its other keys start inside it), so driver state is O(#blocks) scalars at
    any corpus size.  ``(key, order)`` must be unique for determinism."""
    import pyarrow as pa

    orders = [order_col] if isinstance(order_col, str) else list(order_col)
    sorted_ds = ds.sort([key_col] + orders).materialize()
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        schema = sorted_ds.schema()
        cols = {f.name: pa.array([], type=f.type) for f in (schema.base_schema if schema else [])}
        cols[out_col] = pa.array([], type=pa.int64())
        return rd.from_arrow(pa.table(cols))
    sums = ray.get([_block_keyed_sums.remote(r, key_col, val_col) for r in refs])
    carries, carry_key, carry_n = [], None, 0
    for first_key, first_sum, last_key, last_sum in sums:
        off = carry_n if (first_key is not None and first_key == carry_key) else 0
        carries.append(off)
        if first_key is None:
            continue  # empty block: keep carry flowing
        if first_key == last_key:
            carry_key, carry_n = last_key, off + last_sum
        else:
            carry_key, carry_n = last_key, last_sum
    return rd.from_arrow_refs(
        [
            _block_keyed_excl_prefix.remote(r, key_col, val_col, out_col, int(c))
            for r, c in zip(refs, carries)
        ]
    )
