"""Byte-identical extraction goldens (BASELINE.json per-row invariant; FIXTURES.md §3).

The committed fixture pins extractor behavior for EXTRACTOR_VERSION; any
behavior change must bump the version and regenerate goldens deliberately.
"""

import base64
import json
import os

import pyarrow as pa

from entity_resolution_pipeline_ray.functions.text import (
    EXTRACTOR_VERSION,
    extract_text_from_html,
    extract_title_from_html,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "gold_text.json")


def _load():
    with open(GOLDEN) as f:
        return json.load(f)


def test_golden_version_matches():
    assert _load()["extractor_version"] == EXTRACTOR_VERSION


def test_extraction_byte_identical():
    data = _load()
    for case in data["cases"]:
        html = base64.b64decode(case["html_b64"])
        assert extract_text_from_html(html) == case["text"], case.get("url")
        assert extract_title_from_html(html) == case["title"], case.get("url")


def test_extract_stage_matches_goldens_through_ray():
    """The same bytes through the distributed extract stage (map_batches) —
    catches any batch-level divergence from the scalar kernel."""
    from entity_resolution_pipeline_ray.stages.extract import extract_batch

    data = _load()
    cases = [c for c in data["cases"] if c["url"]]
    batch = pa.table(
        {
            "url": [c["url"] for c in cases],
            "warc_ts": pa.array([0] * len(cases), type=pa.timestamp("us")),
            "html": pa.array([base64.b64decode(c["html_b64"]) for c in cases], type=pa.binary()),
            "text": [c["text"] for c in cases],
            "lang": ["en"] * len(cases),
        }
    )
    out = extract_batch(batch)
    assert out["text"].to_pylist() == [c["text"] for c in cases]
    assert out["title"].to_pylist() == [c["title"] for c in cases]


def test_generator_text_column_is_extraction():
    """The corpus generator's ``text`` column is defined as extractor(html) —
    verify on a fresh shard (generator/extractor cross-check)."""
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, shard_pages_table

    tab = shard_pages_table(PagesSpec(num_pages=60, num_shards=2), 1)
    for i in range(tab.num_rows):
        assert extract_text_from_html(tab["html"][i].as_py()) == tab["text"][i].as_py()
