"""Webtext-curation operators (pipelines/curation.py) and the windowed range
join (pipelines/relational.q_window_join): known-answer unit checks plus
brute-force equivalence on synthetic inputs.  The DuckDB oracle parity of the
same operators is covered by tools/check_oracles.py / the driver gate."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import pyarrow.compute as pc

from entity_resolution_pipeline_ray.functions.text import word_tokens
from entity_resolution_pipeline_ray.pipelines.curation import (
    BPE_PATTERN,
    DECON_NGRAM,
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    _contact_strings,
    _gram_hashes_batch,
)


def _bpe_count(s: str) -> int:
    return pc.count_substring_regex(pa.array([s]), pattern=BPE_PATTERN)[0].as_py()


def test_bpe_pattern_known_answers():
    # contraction splits off, space-prefixed runs, digit runs, punct runs
    assert _bpe_count("it's fine") == 3  # "it" "'s" " fine"
    assert _bpe_count("hello world") == 2
    assert _bpe_count("a1b") == 3  # "a" "1" "b"
    assert _bpe_count("wait... 42!") == 4  # "wait" "..." " 42" "!"
    assert _bpe_count("") == 0


def test_bpe_pattern_counts_cover_string():
    # non-overlapping matches must tile the whole string for typical text
    import re

    pat = re.compile(BPE_PATTERN)
    for s in ["it's fine", "wait... 42!", "  spaced  out  ", "MixedCase99, ok."]:
        assert "".join(pat.findall(s)) == s


def test_pii_regexes_hit_planted_shapes():
    import re

    [c] = _contact_strings(np.array([123]))
    assert re.search(EMAIL_RE, c).group(0) == "user123@mail4.example.com"
    assert re.search(PHONE_RE, c) is not None
    assert re.search(IP_RE, c) is not None
    # cascade result contains every placeholder and no residual digits-run PII
    red = re.sub(EMAIL_RE, "<EMAIL>", c)
    red = re.sub(PHONE_RE, "<PHONE>", red)
    red = re.sub(IP_RE, "<IP>", red)
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red
    assert "@" not in red and not re.search(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", red)


def test_gram_hashes_shingle_semantics():
    import pyarrow as pa

    docs = ["one two three four", "one two three four five",
            "one two three four five six", None, ""]
    h, offs = _gram_hashes_batch(pa.array(docs, type=pa.string()))
    sizes = list(np.diff(offs))
    # < DECON_NGRAM tokens -> no grams; then 1 and 2 windows; null/empty -> 0
    assert sizes == [0, 1, 2, 0, 0]
    # hash = md5_u64 of the space-joined shingle
    from entity_resolution_pipeline_ray.functions.hashing import md5_u64

    assert h[offs[1]] == np.uint64(md5_u64("one two three four five"))


def test_decontaminate_flags_shared_grams(ray_session, tmp_path):
    # doc 0/20/40 are "benchmark"; doc 1 copies doc 20's text, doc 2 disjoint
    rows = {
        0: "alpha beta gamma delta epsilon zeta",
        20: "the quick brown fox jumps over the lazy dog",
        40: "totally separate benchmark text goes here now",
        1: "prefix words the quick brown fox jumps over the lazy dog suffix",
        2: "completely unrelated content with many distinct tokens here",
        3: "short text",
    }
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * len(rows), "source": ["s"] * len(rows),
         "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.curation import d_decontaminate

    got = d_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")["contaminated"]
    assert bool(got[1]) is True
    assert bool(got[2]) is False
    assert bool(got[3]) is False  # < n-gram length -> no grams -> clean
    assert set(got.index) == {1, 2, 3}


def test_repetition_ratios_known_answer(ray_session, tmp_path):
    rows = {7: "spam spam spam spam", 8: "all tokens here differ", 9: ""}
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.curation import t_repetition

    got = t_repetition(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[7, "n_tokens"] == 4 and got.loc[7, "n_distinct"] == 1
    assert got.loc[7, "dup_token_ratio"] == 0.75 and got.loc[7, "top_token_ratio"] == 1.0
    assert got.loc[8, "dup_token_ratio"] == 0.0 and got.loc[8, "top_token_ratio"] == 0.25
    assert (got.loc[9] == 0).all()


def test_window_join_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    n = 400
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 6 * 3600, size=n).astype("timedelta64[s]").astype("timedelta64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 5, size=n).astype(np.int64),
            "event_type": rng.choice(["click", "view", "purchase"], size=n),
            "value": rng.random(n),
            "props": ["{}"] * n,
        }
    )
    # plant exact-tie timestamps to pin the strict < semantics
    df.loc[1, ["ts", "user_id"]] = [df.loc[0, "ts"], df.loc[0, "user_id"]]
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_window_join

    got = (
        q_window_join(str(tmp_path), window_seconds=3600)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    w = np.timedelta64(3600, "s")
    exp = []
    for _, r in df[df["event_type"] == "click"].iterrows():
        same = df[df["user_id"] == r["user_id"]]
        n_prior = int(((same["ts"] >= r["ts"] - w) & (same["ts"] < r["ts"])).sum())
        exp.append((r["event_id"], r["user_id"], n_prior))
    exp = pd.DataFrame(exp, columns=["event_id", "user_id", "n_prior"]).sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n_prior": "int64"}), exp.astype({"n_prior": "int64"}))


def test_dedup_apply_fuzzy_transitive_components(ray_session, tmp_path):
    # 1 == 2 (exact), 2 ~ 3 (one token changed) -> component {1,2,3} rep 1;
    # 10 unrelated -> own rep
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(("CHANGED" if i == 30 else f"tok{i}") for i in range(60))
    other = " ".join(f"zzz{i}" for i in range(60))
    rows = {1: base, 2: base, 3: near, 10: other}
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * 4, "source": ["s"] * 4, "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.dedup import dedup_apply_fuzzy

    got = dedup_apply_fuzzy(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[[1, 2, 3], "rep_doc_id"].tolist() == [1, 1, 1]
    assert got.loc[10, "rep_doc_id"] == 10
    assert got["keep"].tolist() == [True, False, False, True]


def test_pivot_unpivot_roundtrip(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * 6),
            "user_id": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
            "event_type": ["click", "click", "view", "purchase", "error", "signup"],
            "value": [1.5, 2.5, 10.0, 7.0, 0.25, 0.75],
            "props": ["{}"] * 6,
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import EVENT_TYPES, q_pivot, q_unpivot

    wide = q_pivot(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
    assert wide.loc[1, "sum_click"] == 4.0 and wide.loc[1, "sum_view"] == 10.0
    assert wide.loc[2, "sum_purchase"] == 7.0 and wide.loc[1, "sum_purchase"] == 0.0
    long = q_unpivot(str(tmp_path)).to_pandas()
    assert len(long) == 2 * len(EVENT_TYPES)
    assert long["total"].sum() == df["value"].sum()


def test_media_resize_and_frame_sample_decoders():
    from entity_resolution_pipeline_ray.pipelines.multimodal import (
        FRAME_HOP,
        FRAME_LEN,
        RESIZE_BUCKETS,
        FrameSampleDecoder,
        ResizeDecoder,
    )
    import hashlib

    payload = bytes(range(160))
    batch = pa.table(
        {"media_id": pa.array([7], type=pa.int64()),
         "payload": pa.array([payload], type=pa.binary()),
         "mime": ["application/octet-stream"]}
    )
    r = ResizeDecoder()(batch).to_pandas()
    assert len(r) == RESIZE_BUCKETS
    # bucket 0 = mean of bytes [0, 20) = 9.5
    assert r.loc[0, "level"] == 9.5
    f = FrameSampleDecoder()(batch).to_pandas()
    assert len(f) == 3  # offsets 0, 64, 128 (last frame truncated to 32 bytes)
    assert f.loc[1, "frame_md5"] == hashlib.md5(payload[64 : 64 + FRAME_LEN]).hexdigest()
    # empty payload -> exactly one frame (md5 of b"")
    empty = pa.table(
        {"media_id": pa.array([8], type=pa.int64()),
         "payload": pa.array([b""], type=pa.binary()),
         "mime": ["application/octet-stream"]}
    )
    fe = FrameSampleDecoder()(empty).to_pandas()
    assert len(fe) == 1 and fe.loc[0, "frame_md5"] == hashlib.md5(b"").hexdigest()


def test_customer_order_counts_plans_agree(ray_session):
    from entity_resolution_pipeline_ray.pipelines.relational import q_customer_order_counts

    sf = "/root/testdata/sf0.001"
    bc = q_customer_order_counts(sf).to_pandas().sort_values("c_custkey").reset_index(drop=True)
    jn = (
        q_customer_order_counts(sf, broadcast_threshold_rows=0)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, jn.astype(bc.dtypes.to_dict()))
    assert (bc["n_orders"] == 0).any()  # zero-fill path actually exercised


def test_unigram_logprob_known_answer(ray_session, tmp_path):
    # corpus: "a a a b" -> P(a)=3/4, P(b)=1/4
    rows = {1: "a a a", 2: "b", 3: ""}
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.curation import t_unigram_logprob

    got = t_unigram_logprob(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[1, "n_scored"] == 3
    assert got.loc[1, "mean_logprob"] == round(float(np.log(0.75)), 6)
    assert got.loc[2, "mean_logprob"] == round(float(np.log(0.25)), 6)
    assert got.loc[3, "n_scored"] == 0 and got.loc[3, "mean_logprob"] == 0.0


def test_boilerplate_flags_common_lines(ray_session, tmp_path):
    from entity_resolution_pipeline_ray.pipelines.curation import BOILER_LINE_TOKENS

    shared = " ".join(f"common{i}" for i in range(BOILER_LINE_TOKENS))
    rows = {
        1: shared + " " + " ".join(f"one{i}" for i in range(BOILER_LINE_TOKENS)),
        2: shared + " " + " ".join(f"two{i}" for i in range(BOILER_LINE_TOKENS)),
        3: " ".join(f"three{i}" for i in range(2 * BOILER_LINE_TOKENS)),
    }
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.curation import d_boilerplate

    got = d_boilerplate(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[1, "n_lines"] == 2 and got.loc[1, "n_common"] == 1
    assert got.loc[2, "n_common"] == 1
    assert got.loc[3, "n_common"] == 0


def test_customer_order_counts_empty_window(ray_session, tmp_path):
    # no orders fall in the 1995 window -> every customer keeps a 0 row on
    # BOTH plans (broadcast zero-fill and the left_outer join empty-right path)
    import pyarrow.parquet as pq

    cust = pa.table(
        {"c_custkey": pa.array([1, 2, 3], type=pa.int64()),
         "c_name": ["a", "b", "c"],
         "c_mktsegment": ["X", "Y", "X"],
         "c_nationkey": pa.array([0, 0, 0], type=pa.int64()),
         "c_acctbal": [0.0, 0.0, 0.0]}
    )
    orders = pa.table(
        {"o_orderkey": pa.array([10], type=pa.int64()),
         "o_custkey": pa.array([1], type=pa.int64()),
         "o_orderdate": pa.array([pd.Timestamp("2001-06-01")]),
         "o_totalprice": [5.0],
         "o_orderstatus": ["F"]}
    )
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    from entity_resolution_pipeline_ray.pipelines.relational import q_customer_order_counts

    for thresh in (2_000_000, 0):
        got = (
            q_customer_order_counts(str(tmp_path), broadcast_threshold_rows=thresh)
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        assert got["n_orders"].tolist() == [0, 0, 0], f"threshold={thresh}"


def test_q5_plans_agree(ray_session):
    from entity_resolution_pipeline_ray.pipelines.relational import q5_local_supplier_volume

    sf = "/root/testdata/sf0.001"
    bc = q5_local_supplier_volume(sf).to_pandas().sort_values("n_name").reset_index(drop=True)
    jn = (
        q5_local_supplier_volume(sf, broadcast_threshold_rows=0)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, jn)


def test_bloom_decontaminate_superset_of_exact(ray_session, tmp_path):
    """Bloom membership has no false negatives: every doc the exact-set
    decontamination flags is flagged by the Bloom variant too, and on this
    tiny corpus (a few hundred lit bits in 2^20) there are no false
    positives either."""
    rows = {
        0: "alpha beta gamma delta epsilon zeta",
        20: "the quick brown fox jumps over the lazy dog",
        1: "prefix words the quick brown fox jumps over the lazy dog suffix",
        2: "completely unrelated content with many distinct tokens here",
        3: "short text",
    }
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * len(rows), "source": ["s"] * len(rows),
         "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.curation import (
        d_bloom_decontaminate,
        d_decontaminate,
    )

    exact = d_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")["contaminated"]
    bloom = d_bloom_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")["contaminated"]
    assert set(exact.index) == set(bloom.index)
    assert bool(bloom[1]) is True and bool(bloom[2]) is False and bool(bloom[3]) is False
    for i in exact.index:
        assert not (exact[i] and not bloom[i]), i  # no false negatives


def test_bloom_positions_deterministic_and_bounded():
    from entity_resolution_pipeline_ray.pipelines.curation import (
        BLOOM_K,
        BLOOM_LOG2M,
        _bloom_positions,
    )

    h = np.array([0, 1, 2**63, 2**64 - 1, 123456789], dtype=np.uint64)
    p = _bloom_positions(h)
    assert p.shape == (5, BLOOM_K)
    assert (p >= 0).all() and (p < (1 << BLOOM_LOG2M)).all()
    assert np.array_equal(p, _bloom_positions(h))
    # Kirsch-Mitzenmacher: pos_i = (lo + i*hi) mod m
    lo, hi = int(h[4]) & 0xFFFFFFFF, int(h[4]) >> 32
    assert list(p[4]) == [(lo + i * hi) % (1 << BLOOM_LOG2M) for i in range(BLOOM_K)]


def test_substring_pairs_shared_window(ray_session, tmp_path):
    from entity_resolution_pipeline_ray.pipelines.dedup import SUBSTR_WIN, substring_dup_pairs

    span = " ".join(f"w{i}" for i in range(SUBSTR_WIN))  # exactly one window
    rows = {
        1: f"intro text {span} outro one",
        2: f"different beginning {span} and a different ending",
        3: "no shared window here at all " + " ".join(f"x{i}" for i in range(SUBSTR_WIN)),
        4: " ".join(f"w{i}" for i in range(SUBSTR_WIN - 1)),  # one token short
    }
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * len(rows), "source": ["s"] * len(rows),
         "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    got = substring_dup_pairs(str(tmp_path)).to_pandas()
    assert set(zip(got["left_id"], got["right_id"])) == {(1, 2)}


def test_line_dedup_plans_agree_and_semantics(monkeypatch):
    """Broadcast and join apply plans produce identical cleaned docs, and the
    removed-line total equals occurrences minus distinct line contents."""
    import duckdb

    import entity_resolution_pipeline_ray.pipelines.curation as C
    import entity_resolution_pipeline_ray.pipelines.dedup as D

    sf = "/root/testdata/sf0.001"
    a = C.d_line_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(D, "BROADCAST_THRESHOLD_ROWS", 0)
    b = C.d_line_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    occ, distinct = con.sql(
        f"""WITH s AS (SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z_]+') AS tk FROM documents),
        u AS (SELECT unnest(list_transform(range(0, CAST(ceil(len(tk)*1.0/{C.BOILER_LINE_TOKENS}) AS BIGINT)),
              i -> array_to_string(tk[i*{C.BOILER_LINE_TOKENS}+1:(i+1)*{C.BOILER_LINE_TOKENS}], ' '))) AS line FROM s)
        SELECT count(*), count(DISTINCT line) FROM u"""
    ).fetchone()
    con.close()
    assert a["n_lines"].sum() == occ
    assert a["n_removed"].sum() == occ - distinct


@pytest.mark.parametrize("op_name", ["add", "maximum", "bitwise_or"])
def test_reduce_registers_tree_equals_flat(ray_session, op_name):
    import ray.data as rd

    from entity_resolution_pipeline_ray.rayops import reduce_registers

    op = getattr(np, op_name)
    rng = np.random.default_rng(13)
    parts = rng.integers(0, 1000, size=(300, 64)).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"reg": pa.array([p.tobytes() for p in parts], type=pa.binary())})
    ).repartition(7)
    # fanin 4 forces several tree rounds on 300 rows
    got = reduce_registers(ds, "reg", np.int64, op, 64, fanin=4)
    assert np.array_equal(got, op.reduce(parts, axis=0))


def test_bigram_buckets_respect_doc_boundaries():
    from entity_resolution_pipeline_ray.pipelines.curation import BIGRAM_BUCKETS, _bigram_buckets
    from entity_resolution_pipeline_ray.functions.hashing import md5_u64

    col = pa.array(["", "a b c", None, "x", "p q"])
    b, k = _bigram_buckets(col)
    assert k.tolist() == [0, 2, 0, 0, 1]
    expect = [md5_u64(s) & (BIGRAM_BUCKETS - 1) for s in ("a b", "b c", "p q")]
    assert b.tolist() == expect


def test_cms_topk_estimates_dominate_exact_and_plans_agree():
    """CMS never undercounts; the driver-merge and distributed top-k plans
    emit identical rows; estimates match a direct numpy CMS replay."""
    import pandas as pd

    from entity_resolution_pipeline_ray.functions.hashing import md5_u64_arr
    from entity_resolution_pipeline_ray.functions.text import token_lists_arrow
    from entity_resolution_pipeline_ray.pipelines.curation import CMS_D, CMS_W, t_cms_topk

    sf = "/root/testdata/sf0.001"
    a = t_cms_topk(sf).to_pandas()
    assert len(a) == 25
    assert (a["est_count"] >= a["exact_count"]).all()

    b = t_cms_topk(sf, driver_merge_threshold=0).to_pandas()
    canon = lambda df: df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    assert canon(a).equals(canon(b))

    # replay the sketch in one numpy pass over the whole corpus
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    flat, _ = token_lists_arrow(pa.array(docs["text"].tolist()))
    uniq, counts = np.unique(np.asarray(flat, dtype=object), return_counts=True)
    h = md5_u64_arr(list(uniq))
    regs = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for r in range(CMS_D):
        bk = ((h >> np.uint64(16 * r)) & np.uint64(CMS_W - 1)).astype(np.int64)
        np.add.at(regs, r * CMS_W + bk, counts)
    ht = md5_u64_arr(a["token"].tolist())
    est = np.full(len(a), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        bk = ((ht >> np.uint64(16 * r)) & np.uint64(CMS_W - 1)).astype(np.int64)
        est = np.minimum(est, regs[r * CMS_W + bk])
    assert (a["est_count"].to_numpy() == est).all()


def test_anti_join_plans_agree_and_complement_holds(ray_session):
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.relational import q_anti_join

    sf = "/root/testdata/sf0.001"
    a = q_anti_join(sf).to_pandas()
    b = q_anti_join(sf, broadcast_threshold_rows=0).to_pandas()
    canon = lambda df: df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    assert canon(a).equals(canon(b))
    # complement check: flagged customers truly have no recent order
    orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    recent = set(orders.loc[orders["o_orderdate"] >= pd.Timestamp("1998-04-01"), "o_custkey"])
    assert not (set(a["c_custkey"]) & recent)
    cust = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    assert set(a["c_custkey"]) == set(cust["c_custkey"]) - recent


def test_value_histogram_counts_match_numpy(ray_session):
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.relational import q_value_histogram

    sf = "/root/testdata/sf0.001"
    h = q_value_histogram(sf).to_pandas()
    v = pd.read_parquet(f"{sf}/events.parquet", columns=["value"])["value"].to_numpy(np.float64)
    lo, hi = v.min(), v.max()
    w = (hi - lo) / 20.0
    b = np.minimum(np.floor((v - lo) / w), 19).astype(np.int64)
    ref = np.bincount(b, minlength=20)
    got = np.zeros(20, dtype=np.int64)
    got[h["bucket"].to_numpy()] = h["n"].to_numpy()
    assert (got == ref).all()
    assert h["n"].sum() == len(v)


def test_rolling_mean_matches_pandas_reference(ray_session):
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.relational import q_rolling_mean

    sf = "/root/testdata/sf0.001"
    mine = q_rolling_mean(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev["rolling_value"] = (
        ev.groupby("user_id")["value"].transform(lambda s: s.rolling(4, min_periods=1).mean()).round(6)
    )
    ref = ev.sort_values("event_id").reset_index(drop=True)
    assert (mine["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    assert np.allclose(mine["rolling_value"], ref["rolling_value"], atol=0)


def test_funnel_stage_semantics(ray_session):
    """Greedy-from-first-view windowed funnel: replay per user in pure pandas
    and compare stages exactly."""
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.relational import (
        FUNNEL_STEPS,
        FUNNEL_WINDOW_HOURS,
        q_funnel,
    )

    sf = "/root/testdata/sf0.001"
    mine = q_funnel(sf).to_pandas().set_index("user_id")["funnel_stage"]
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"])
    win = pd.Timedelta(hours=FUNNEL_WINDOW_HOURS)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        pos, stage, prev_ts = -1, 0, None
        for step in FUNNEL_STEPS:
            cand = g[(g["event_type"] == step) & (g.index > pos)]
            if prev_ts is not None:
                cand = cand[cand["ts"] <= prev_ts + win]
            if cand.empty:
                break
            pos = int(cand.index[0])
            prev_ts = cand["ts"].iloc[0]
            stage += 1
        assert mine.loc[uid] == stage, uid
    # all three stages occur on this corpus (discriminative window)
    assert set(mine.unique()) == {1, 2, 3}


def test_retention_matrix_invariants(ray_session):
    """Cohort sizes at k=0 equal the number of users first seen that day;
    retention counts never exceed the cohort size; total distinct
    (user, day) pairs are conserved."""
    import pandas as pd

    from entity_resolution_pipeline_ray.pipelines.relational import q_retention

    sf = "/root/testdata/sf0.001"
    r = q_retention(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "user_id"])
    ev["d"] = ev["ts"].dt.floor("D")
    am = ev[["user_id", "d"]].drop_duplicates()
    coh = am.groupby("user_id")["d"].min()
    # k=0 row per cohort equals the cohort's user count
    c0 = r[r["k"] == 0].set_index("cohort_m")["n_users"]
    days = (coh.dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days
    ref0 = days.value_counts()
    assert c0.to_dict() == ref0.to_dict()
    # conservation + bound
    assert r["n_users"].sum() == len(am)
    cohort_sizes = r[r["k"] == 0].set_index("cohort_m")["n_users"]
    assert (r.set_index("cohort_m")["n_users"] <= cohort_sizes.reindex(r["cohort_m"]).to_numpy()).all()


def test_pmi_bigrams_are_true_collocations(ray_session):
    """PMI replay in pure pandas: top bigrams occur more often than chance
    (pmi > 0) and their counts meet the minimum support."""
    import pandas as pd

    from entity_resolution_pipeline_ray.functions.text import token_lists_arrow
    from entity_resolution_pipeline_ray.pipelines.text_analysis import PMI_MIN_COUNT, t_pmi_bigrams

    sf = "/root/testdata/sf0.001"
    out = t_pmi_bigrams(sf).to_pandas()
    assert len(out) == 25
    assert (out["n_pair"] >= PMI_MIN_COUNT).all()
    assert (out["pmi"] > 0).all()
    assert (out["rank"].to_numpy() == np.arange(1, 26)).all()

    # spot-replay the top bigram's pmi from raw counts
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    flat, offs = token_lists_arrow(pa.array(docs["text"].tolist()))
    toks = flat.to_pylist()
    from collections import Counter

    uni = Counter(toks)
    bi = Counter()
    for d in range(len(offs) - 1):
        seg = toks[offs[d] : offs[d + 1]]
        bi.update(" ".join(p) for p in zip(seg, seg[1:]))
    nu, nb = sum(uni.values()), sum(bi.values())
    top = out.iloc[0]
    x, y = top["bigram"].split(" ", 1)
    ref = np.log(bi[top["bigram"]] / nb) - np.log(uni[x] / nu) - np.log(uni[y] / nu)
    assert abs(top["pmi"] - round(ref, 6)) < 1e-9


def test_dedup_apply_fuzzy_keep_best_longest_wins(ray_session, tmp_path):
    # same component {1, 2, 3} as the min-id test, but doc 3 is made longest:
    # keep-best elects 3 as rep; min-id policy would elect 1
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(("CHANGED" if i == 30 else f"tok{i}") for i in range(60)) + "  trailing pad"
    other = " ".join(f"zzz{i}" for i in range(60))
    rows = {1: base, 2: base, 3: near, 10: other}
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()),
         "lang": ["en"] * 4, "source": ["s"] * 4, "n_chars": [len(v) for v in rows.values()]}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.dedup import dedup_apply_fuzzy_keep_best

    got = dedup_apply_fuzzy_keep_best(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[[1, 2, 3], "rep_doc_id"].tolist() == [3, 3, 3]
    assert got.loc[10, "rep_doc_id"] == 10  # singleton is its own rep
    assert got["keep"].tolist() == [False, False, True, True]


def test_dedup_apply_fuzzy_keep_best_tie_breaks_min_id(ray_session, tmp_path):
    # docs 1 == 2 verbatim (equal n_chars): the tie breaks to the lower doc_id
    base = " ".join(f"tok{i}" for i in range(60))
    t = pa.table(
        {"doc_id": [1, 2], "text": [base, base],
         "lang": ["en"] * 2, "source": ["s"] * 2, "n_chars": [len(base)] * 2}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.dedup import dedup_apply_fuzzy_keep_best

    got = dedup_apply_fuzzy_keep_best(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert got["rep_doc_id"].tolist() == [1, 1]
    assert got["keep"].tolist() == [True, False]
