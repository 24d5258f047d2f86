"""Extract stage: pages(url, warc_ts, html, text, lang) → docs(doc_id, url,
warc_ts, title, domain, text, lang).

Reference analog: the per-record field extraction + normalization
(/root/reference/src/batch_parallel_preprocessing.py:304-354, :414-430), re-targeted at
HTML.  Stateless ``map_batches`` over zero-copy Arrow batches; the wide ``html``
column is DROPPED here — nothing downstream reads it, so it must not ride
through the shuffles.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import doc_id_for_urls
from ..functions.text import (
    domain_of_url,
    extract_text_from_html,
    extract_title_from_html,
    nullify_sentinels,
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("title", pa.string()),
        pa.field("domain", pa.string()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """html bytes → deterministic text/title/domain; doc_id = stable u64 of url.

    Byte-identical text per url is the contract (BASELINE.json per-row
    invariant) — goldens in tests/golden/ pin it.
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = [extract_text_from_html(h) for h in htmls]
    titles = [extract_title_from_html(h) for h in htmls]
    domains = [domain_of_url(u) for u in urls]
    return pa.Table.from_arrays(
        [
            pa.array(doc_id_for_urls(urls), type=pa.int64()),
            batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"],
            batch["warc_ts"].combine_chunks() if isinstance(batch["warc_ts"], pa.ChunkedArray) else batch["warc_ts"],
            pa.array(titles, type=pa.string()),
            pa.array(domains, type=pa.string()),
            pa.array(texts, type=pa.string()),
            nullify_sentinels(batch["lang"]) if batch["lang"].null_count < len(batch) else pa.nulls(len(batch), pa.string()),
        ],
        schema=DOCS_SCHEMA,
    )


def extract_docs(pages_ds, batch_size: int | None = None):
    """pages Dataset → docs Dataset.

    batch_size=None = one batch per input BLOCK.  This matters when extract is
    fused with an upstream generator/reader whose blocks are few rows that
    explode downstream: a row-count batch_size makes the fused operator bundle
    MANY input blocks into one task (bundling counts input rows, not output
    rows) and collapses parallelism — observed as a 32-shard generate+extract
    running as a single task.  Block size (bytes) is the memory guard instead:
    keep source blocks modest when html rows are wide.
    """
    return pages_ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
