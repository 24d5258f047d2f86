"""Deterministic synthetic Common-Crawl-style pages corpus with planted entity
clusters — the engine's test/bench input (FIXTURES.md §1-2).

Analog of the reference's labeled corpus (data/input/training_dataset.csv: 2,354
records, 159 unique persons — /root/reference/output/field_statistics.json) and its
ground-truth pairs CSV (/root/reference/config.yml:21, parsed at
/root/reference/src/batch_parallel_querying.py:277-290), re-targeted at web pages:

- **Planted clusters**: groups of pages that are "the same document" under
  template noise (word edits, boilerplate swaps, re-hosted domains, whitespace
  jitter) — analog of one person under name variants (/root/reference/README.md:18-21).
- **Hard negatives**: same title + same template, genuinely different body —
  the "Franz Schubert problem" (/root/reference/README.md:57-72).
- **Skewed domains**: Zipf-ish domain popularity so a few hot domains hold a
  large share of pages (exercises block salting / pair caps).
- **Nulls**: ~2% pages with empty html → empty text, missing lang.

Generation is sharded and deterministic: cluster ids are range-partitioned over
shards and each shard is generated from RandomState(seed, shard) — so the
corpus is identical regardless of parallelism, and a Ray pipeline can generate
shards in parallel with `from_items(shards).map_batches(...)`.

The `text` column is defined as `extract_text_from_html(html)` — the committed
golden fixtures and the byte-identical-extraction test derive from this.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.text import extract_text_from_html

# epoch base for warc_ts (2024-01-01T00:00:00Z in microseconds)
_TS_BASE_US = 1_704_067_200_000_000

_UNICODE_WORDS = ["archäologie", "münchen", "café", "naïve", "œuvre", "señor", "tokyō", "łódź"]
_TEMPLATES = 3


def _wordlist(seed: int, n: int = 800) -> list[str]:
    """Deterministic pseudo-word vocabulary (consonant-vowel syllables)."""
    rng = np.random.RandomState(seed ^ 0x5EED)
    cons = list("bcdfghjklmnprstvwz")
    vows = list("aeiou")
    words = []
    for _ in range(n - len(_UNICODE_WORDS)):
        k = rng.randint(2, 5)
        w = "".join(cons[rng.randint(len(cons))] + vows[rng.randint(len(vows))] for _ in range(k))
        words.append(w)
    return words + list(_UNICODE_WORDS)


def _domains(seed: int, n: int) -> list[str]:
    rng = np.random.RandomState(seed ^ 0xD0AA)
    tlds = ["com", "org", "net", "io", "de", "fr"]
    out = []
    for i in range(n):
        stem = "".join(chr(97 + rng.randint(26)) for _ in range(rng.randint(5, 12)))
        out.append(f"{stem}{i}.{tlds[rng.randint(len(tlds))]}")
    return out


@dataclass(frozen=True)
class PagesSpec:
    num_pages: int
    seed: int = 42
    num_shards: int = 16
    mean_cluster_size: int = 8
    body_words: tuple[int, int] = (60, 150)  # per-page body length range
    null_fraction: float = 0.02
    hard_negative_fraction: float = 0.2  # fraction of clusters paired into hard negatives


def spec_for_sf(sf: float, seed: int = 42) -> PagesSpec:
    """Scale-factor → corpus size: sf0.001→2k pages (unit), 0.01→20k, 0.1→100k (bench)."""
    if sf >= 0.1:
        return PagesSpec(num_pages=100_000, seed=seed, num_shards=64)
    if sf >= 0.01:
        return PagesSpec(num_pages=20_000, seed=seed, num_shards=32)
    return PagesSpec(num_pages=2_000, seed=seed, num_shards=8)


def sf_of_dir(sf_dir: str) -> float:
    """Parse ".../sf0.01" → 0.01 (defaults to 0.001 when unparseable)."""
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.001


# ----------------------------------------------------------------------------- plan


def _shard_plan(spec: PagesSpec, shard: int) -> dict:
    """Cheap structural plan for one shard: clusters, variants, urls, labels —
    everything except html rendering.  Pure function of (spec, shard)."""
    rng = np.random.RandomState((spec.seed * 1_000_003 + shard) % (2**31 - 1))
    words = _wordlist(spec.seed)
    n_domains = max(8, spec.num_pages // 50)
    domains = _domains(spec.seed, n_domains)
    # Zipf-ish domain popularity: domain i has weight 1/(i+1)
    dweights = 1.0 / np.arange(1, n_domains + 1)
    dweights /= dweights.sum()

    pages_this_shard = spec.num_pages // spec.num_shards + (1 if shard < spec.num_pages % spec.num_shards else 0)

    clusters = []
    total = 0
    cidx = 0
    while total < pages_this_shard:
        if rng.rand() < 0.25:
            size = 1
        else:
            size = 2 + rng.poisson(spec.mean_cluster_size - 2)
        size = int(min(size, pages_this_shard - total, 40))
        if size <= 0:
            break
        entity_id = np.uint64(shard) << np.uint64(32) | np.uint64(cidx)
        title_idx = rng.randint(0, len(words), size=rng.randint(2, 5))
        body_idx = rng.randint(0, len(words), size=rng.randint(spec.body_words[0], spec.body_words[1]))
        template = int(rng.randint(_TEMPLATES))
        base_domain = int(rng.choice(n_domains, p=dweights))
        clusters.append(
            {
                "entity_id": int(entity_id),
                "cidx": cidx,
                "size": size,
                "title_idx": title_idx,
                "body_idx": body_idx,
                "template": template,
                "base_domain": base_domain,
            }
        )
        total += size
        cidx += 1

    # hard negatives: pair adjacent clusters — the second of the pair copies the
    # first's title + template but keeps its own body
    n_hard = int(len(clusters) * spec.hard_negative_fraction)
    hard_pairs = []
    for i in range(0, 2 * n_hard - 1, 2):
        if i + 1 >= len(clusters):
            break
        a, b = clusters[i], clusters[i + 1]
        b["title_idx"] = a["title_idx"]
        b["template"] = a["template"]
        hard_pairs.append((i, i + 1))

    # variants (pages)
    pages = []
    for c in clusters:
        title = " ".join(words[j] for j in c["title_idx"]).title()
        for v in range(c["size"]):
            vrng = np.random.RandomState((spec.seed * 7_777_777 + shard * 65_537 + c["cidx"] * 101 + v) % (2**31 - 1))
            domain = domains[c["base_domain"]]
            if v > 0 and vrng.rand() < 0.2:  # re-hosted variant
                domain = domains[int(vrng.randint(len(domains)))]
            # body edits: replace ~2%, delete ~1% of words (keeps pair Jaccard high)
            body = [words[j] for j in c["body_idx"]]
            if v > 0:
                nb = len(body)
                n_rep = max(0, int(vrng.binomial(nb, 0.015)))
                for _ in range(n_rep):
                    body[int(vrng.randint(nb))] = words[int(vrng.randint(len(words)))]
                n_del = max(0, int(vrng.binomial(nb, 0.005)))
                for _ in range(n_del):
                    del body[int(vrng.randint(len(body)))]
            vtitle = title
            if v > 0 and vrng.rand() < 0.1:  # occasional title jitter
                vtitle = title + " " + words[int(vrng.randint(len(words)))].title()
            url = f"https://{domain}/{shard:03d}/{c['cidx']:05d}/{v:02d}"
            is_null = vrng.rand() < spec.null_fraction
            pages.append(
                {
                    "url": url,
                    "entity_id": c["entity_id"],
                    "title": vtitle,
                    "body": body,
                    "template": c["template"],
                    "ws_seed": int(vrng.randint(2**31 - 1)),
                    "ts": _TS_BASE_US + int(vrng.randint(0, 365 * 24 * 3600)) * 1_000_000,
                    "lang": None if is_null else ["en", "de", "fr", "es"][int(vrng.rand() * 4) if vrng.rand() < 0.3 else 0],
                    "is_null": is_null,
                }
            )
    return {"clusters": clusters, "hard_pairs": hard_pairs, "pages": pages}


# ----------------------------------------------------------------------------- render

_NAV_VARIANTS = [
    "<nav><a href='/'>Home</a> | <a href='/about'>About</a> | <a href='/contact'>Contact</a></nav>",
    "<nav><ul><li><a href='/'>Start</a></li><li><a href='/faq'>FAQ</a></li></ul></nav>",
    "<div class='nav'><a href='/'>Index</a> &middot; <a href='/help'>Help</a></div>",
]
_FOOTERS = [
    "<footer>&copy; 2024 Example Corp &amp; partners</footer>",
    "<footer><p>All rights reserved &mdash; example</p></footer>",
    "<footer>Imprint &bull; Privacy</footer>",
]


def _render_html(page: dict) -> bytes:
    """Deterministic HTML for a planned page, with whitespace jitter that the
    extractor must normalize away (tests extraction, not content)."""
    if page["is_null"]:
        return b""
    rng = np.random.RandomState(page["ws_seed"])
    t = page["template"]
    ws = lambda: " " * int(rng.randint(1, 4)) + ("\n" if rng.rand() < 0.4 else "")
    paras = []
    body = page["body"]
    step = max(1, len(body) // 4)
    for i in range(0, len(body), step):
        paras.append(f"<p>{ws()}{' '.join(body[i:i+step])}{ws()}</p>")
    nav = _NAV_VARIANTS[(t + int(rng.rand() < 0.3)) % len(_NAV_VARIANTS)]
    footer = _FOOTERS[t % len(_FOOTERS)]
    doc = (
        f"<!DOCTYPE html><html><head>{ws()}<title>{page['title']}</title>"
        f"<style>body{{margin:0}}</style>"
        f"<script>var t={t};</script></head>"
        f"<body>{nav}{ws()}<h1>{page['title']}</h1>{ws()}"
        f"{''.join(paras)}{footer}</body></html>"
    )
    return doc.encode("utf-8")


_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def shard_pages_table(spec: PagesSpec, shard: int) -> pa.Table:
    """One shard of the pages table (input_hint schema:
    url, warc_ts, html, text, lang).  text = extract_text_from_html(html)."""
    plan = _shard_plan(spec, shard)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for p in plan["pages"]:
        h = _render_html(p)
        urls.append(p["url"])
        tss.append(p["ts"])
        htmls.append(h)
        texts.append(extract_text_from_html(h))
        langs.append(p["lang"])
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(tss, type=pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array(texts, type=pa.string()),
            pa.array(langs, type=pa.string()),
        ],
        schema=_PAGES_SCHEMA,
    )


def shard_labels_table(spec: PagesSpec, shard: int) -> pa.Table:
    """Gold cluster assignment (url → entity_id) for one shard (FIXTURES.md §4)."""
    plan = _shard_plan(spec, shard)
    return pa.table(
        {
            "url": pa.array([p["url"] for p in plan["pages"]], type=pa.string()),
            "entity_id": pa.array([p["entity_id"] for p in plan["pages"]], type=pa.int64()),
        }
    )


def shard_labeled_pairs_table(spec: PagesSpec, shard: int, max_pos_per_cluster: int = 40) -> pa.Table:
    """Ground-truth labeled pairs for one shard (FIXTURES.md §2):
    positives within planted clusters, negatives from hard-negative cluster pairs
    plus random cross-cluster pairs, roughly 1:1 (reference test set balance,
    /root/reference/output/reports/test_results_analysis_summary.md:15-33).
    left_url < right_url canonical ordering."""
    plan = _shard_plan(spec, shard)
    rng = np.random.RandomState((spec.seed * 31 + shard) % (2**31 - 1))
    # null (empty-html) pages carry no matchable content — they stay in the
    # corpus (robustness) but out of the ground truth, like unlabeled records
    # in the reference's corpus.
    labelable = [p for p in plan["pages"] if not p["is_null"]]
    by_cluster: dict[int, list[str]] = {}
    for p in labelable:
        by_cluster.setdefault(p["entity_id"], []).append(p["url"])
    lefts, rights, matches = [], [], []

    def add(a: str, b: str, m: bool):
        if a == b:
            return
        lo, hi = (a, b) if a < b else (b, a)
        lefts.append(lo)
        rights.append(hi)
        matches.append(m)

    for urls in by_cluster.values():
        combos = list(itertools.combinations(sorted(urls), 2))
        if len(combos) > max_pos_per_cluster:
            idx = rng.choice(len(combos), size=max_pos_per_cluster, replace=False)
            combos = [combos[i] for i in sorted(idx)]
        for a, b in combos:
            add(a, b, True)
    n_pos = len(lefts)
    clusters = plan["clusters"]
    # hard negatives
    for i, j in plan["hard_pairs"]:
        ua = by_cluster.get(clusters[i]["entity_id"], [])
        ub = by_cluster.get(clusters[j]["entity_id"], [])
        for a in ua[:4]:
            for b in ub[:4]:
                add(a, b, False)
    # random negatives to balance
    all_pages = labelable
    guard = 0
    while len(lefts) < 2 * n_pos and guard < 10 * n_pos + 100:
        guard += 1
        pa_, pb_ = all_pages[int(rng.randint(len(all_pages)))], all_pages[int(rng.randint(len(all_pages)))]
        if pa_["entity_id"] != pb_["entity_id"]:
            add(pa_["url"], pb_["url"], False)
    # canonical order + dedup
    seen = set()
    fl, fr, fm = [], [], []
    for a, b, m in zip(lefts, rights, matches):
        if (a, b) in seen:
            continue
        seen.add((a, b))
        fl.append(a)
        fr.append(b)
        fm.append(m)
    return pa.table(
        {
            "left_url": pa.array(fl, type=pa.string()),
            "right_url": pa.array(fr, type=pa.string()),
            "match": pa.array(fm, type=pa.bool_()),
        }
    )


# ----------------------------------------------------------------------------- dataset builders (Ray)


def pages_dataset(spec: PagesSpec):
    """Distributed deterministic generation: one task per shard.

    `override_num_blocks=num_shards` so each shard is generated by exactly one
    task; downstream stages re-block as needed.  Ray session must already exist.
    """
    import ray.data as rd

    shards = [{"shard": s} for s in range(spec.num_shards)]
    ds = rd.from_items(shards, override_num_blocks=spec.num_shards)

    def gen(batch: pa.Table) -> pa.Table:
        tables = [shard_pages_table(spec, int(s)) for s in batch["shard"].to_pylist()]
        return pa.concat_tables(tables) if tables else shard_pages_table(spec, 0).slice(0, 0)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=1)


def _parallel_shard_tables(fn, spec: PagesSpec) -> pa.Table:
    """Run a per-shard table builder as Ray tasks when a session exists
    (the shard plans are independent), else serially."""
    import ray

    if ray.is_initialized():
        remote_fn = ray.remote(fn)
        return pa.concat_tables(ray.get([remote_fn.remote(spec, s) for s in range(spec.num_shards)]))
    return pa.concat_tables([fn(spec, s) for s in range(spec.num_shards)])


def labels_table(spec: PagesSpec) -> pa.Table:
    """Full gold labels (small result; shard plans built in parallel)."""
    return _parallel_shard_tables(shard_labels_table, spec)


def labeled_pairs_table(spec: PagesSpec) -> pa.Table:
    """Full ground-truth pairs (small result; shard plans built in parallel)."""
    return _parallel_shard_tables(shard_labeled_pairs_table, spec)


def materialize_pages_parquet(spec: PagesSpec, base_dir: str = "/tmp/erp_gate_corpus") -> str:
    """Write the deterministic pages corpus to Parquet (one file per shard)
    and return the directory — so a DuckDB oracle can query the SAME corpus a
    generated-input pipeline consumed (``read_parquet('<dir>/*.parquet')``).

    Pure pyarrow (no Ray session needed: ``oracle_sql()`` may run before any
    query).  Idempotent via a ``_SUCCESS`` marker; the path is keyed by every
    spec field, so two specs never collide.  Shards are generated in parallel
    as Ray tasks when a session exists (same plan-determinism argument as
    ``_parallel_shard_tables``)."""
    import os

    import pyarrow.parquet as pq

    key = (
        f"p{spec.num_pages}_s{spec.num_shards}_seed{spec.seed}_m{spec.mean_cluster_size}"
        f"_b{spec.body_words[0]}-{spec.body_words[1]}_n{spec.null_fraction}_h{spec.hard_negative_fraction}"
    )
    out = os.path.join(base_dir, key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    def write_shard(spec: PagesSpec, s: int) -> None:
        pq.write_table(shard_pages_table(spec, s), os.path.join(out, f"shard_{s:04d}.parquet"))

    import ray

    if ray.is_initialized():
        remote_fn = ray.remote(write_shard)
        ray.get([remote_fn.remote(spec, s) for s in range(spec.num_shards)])
    else:
        for s in range(spec.num_shards):
            write_shard(spec, s)
    with open(marker, "w") as f:
        f.write("ok")
    return out
