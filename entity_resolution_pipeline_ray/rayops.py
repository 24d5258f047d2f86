"""Small Ray-Data utilities shared across stages."""

from __future__ import annotations

import ray
import ray.data as rd


@ray.remote
def _block_num_rows(block) -> int:
    return block.num_rows


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
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if len(keep) == len(refs):
        return ds
    if not keep:
        # preserve one empty block so schema-bearing consumers still work
        return ds.limit(0)
    return rd.from_arrow_refs(keep)


def safe_join(left, right, *, num_partitions: int, on: tuple, right_on: tuple, join_type: str = "inner", **kw):
    """``Dataset.join`` with empty-block sanitization on both sides."""
    return drop_empty_blocks(left).join(
        drop_empty_blocks(right),
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
        **kw,
    )
