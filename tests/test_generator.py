"""Corpus generator determinism and structural properties (FIXTURES.md §1-2)."""

import pyarrow as pa
import pyarrow.compute as pc

from entity_resolution_pipeline_ray.sources.pages import (
    PagesSpec,
    labeled_pairs_table,
    labels_table,
    shard_pages_table,
    spec_for_sf,
)


def test_deterministic_regeneration():
    spec = PagesSpec(num_pages=300, num_shards=3)
    a = shard_pages_table(spec, 1)
    b = shard_pages_table(spec, 1)
    assert a.equals(b)


def test_page_count_and_unique_urls():
    spec = PagesSpec(num_pages=500, num_shards=4)
    tabs = [shard_pages_table(spec, s) for s in range(4)]
    tab = pa.concat_tables(tabs)
    assert tab.num_rows == 500
    urls = tab["url"].to_pylist()
    assert len(set(urls)) == len(urls)


def test_labels_cover_all_pages():
    spec = PagesSpec(num_pages=300, num_shards=3)
    pages = pa.concat_tables([shard_pages_table(spec, s) for s in range(3)])
    labels = labels_table(spec)
    assert set(labels["url"].to_pylist()) == set(pages["url"].to_pylist())


def test_labeled_pairs_properties():
    spec = spec_for_sf(0.001)
    pairs = labeled_pairs_table(spec)
    lefts = pairs["left_url"].to_pylist()
    rights = pairs["right_url"].to_pylist()
    # canonical ordering and no dup pairs
    assert all(a < b for a, b in zip(lefts, rights))
    assert len({(a, b) for a, b in zip(lefts, rights)}) == len(lefts)
    # rough balance (FIXTURES §2: ~1:1 like the reference test set)
    n_pos = pc.sum(pairs["match"]).as_py()
    assert 0.3 <= n_pos / pairs.num_rows <= 0.7
    # labels consistency: positive pairs share entity, negatives don't
    labels = dict(zip(labels_table(spec)["url"].to_pylist(), labels_table(spec)["entity_id"].to_pylist()))
    for a, b, m in zip(lefts[:500], rights[:500], pairs["match"].to_pylist()[:500]):
        assert (labels[a] == labels[b]) == m


def test_nulls_and_domain_skew():
    spec = spec_for_sf(0.001)
    tab = pa.concat_tables([shard_pages_table(spec, s) for s in range(spec.num_shards)])
    n_empty = pc.sum(pc.equal(tab["text"], "")).as_py()
    assert 0 < n_empty < 0.1 * tab.num_rows  # some null pages, not too many
    assert tab["lang"].null_count == n_empty
    # skew: hottest domain holds >5% of pages
    from collections import Counter

    from entity_resolution_pipeline_ray.functions.text import domain_of_url

    doms = Counter(domain_of_url(u) for u in tab["url"].to_pylist())
    assert doms.most_common(1)[0][1] > 0.05 * tab.num_rows
