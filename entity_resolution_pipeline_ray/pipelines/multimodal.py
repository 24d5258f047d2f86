"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are NOT in this container, so the decode step
is STUBBED (clearly marked): ``RealMediaDecoder`` raises NotImplementedError;
``FakeMediaDecoder`` is a deterministic stand-in computing byte-level features.
The Ray-side plumbing — binary schema, small batch sizes for wide rows, actor
signature, output layout — is real and tested; swapping in a real decoder is a
one-class change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..rayops import read_parquet_clean

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
    ]
)


class RealMediaDecoder:
    """The production image-decode stage, feature-gated on Pillow.

    With Pillow installed, decodes each payload, grayscales and mean-pools it
    to a 4×4 grid — a 16-dim feature matching FakeMediaDecoder's output
    layout (media_id, n_bytes, content_id, feature[16]).  Without Pillow
    (this container) construction raises NotImplementedError and the
    deterministic FakeMediaDecoder stands in for tests.  At scale this runs
    as an actor pool (``NEEDS_WARM_STATE``) because decoders hold codec state
    and batches of wide binary rows must be small (batch BYTES, not rows,
    bound worker memory).
    """

    NEEDS_WARM_STATE = True

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as ex:
            raise NotImplementedError(
                "media decode libraries (Pillow/ffmpeg) are not available in this "
                "environment; use FakeMediaDecoder for plumbing tests"
            ) from ex
        from PIL import Image

        self._Image = Image  # codec state warmed once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        sizes = np.zeros(n, dtype=np.int64)
        content_ids = []
        feats = np.zeros((n, 16), dtype=np.float32)
        for i, p in enumerate(payloads):
            b = p or b""
            sizes[i] = len(b)
            content_ids.append(hashlib.blake2b(b, digest_size=8).hexdigest())
            if b:
                try:
                    img = self._Image.open(io.BytesIO(b)).convert("L").resize((4, 4))
                    feats[i] = np.asarray(img, dtype=np.float32).ravel() / 255.0
                except Exception:
                    pass  # undecodable payload → zero feature, real n_bytes/id
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(sizes, type=pa.int64()),
                "content_id": pa.array(content_ids, type=pa.string()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), 16
                ),
            }
        )


class FakeMediaDecoder:
    """Deterministic decode stand-in: byte-level 'features' of the payload
    (size, first/last byte, blake2b-64 content id, 16-bin byte histogram as the
    stand-in for an image feature vector)."""

    def __init__(self):
        self.hist_bins = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        sizes = np.zeros(n, dtype=np.int64)
        content_ids = []
        feats = np.zeros((n, self.hist_bins), dtype=np.float32)
        for i, p in enumerate(payloads):
            b = p or b""
            sizes[i] = len(b)
            content_ids.append(hashlib.blake2b(b, digest_size=8).hexdigest())
            if b:
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=self.hist_bins).astype(np.float32)
                feats[i] = hist / hist.sum()
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(sizes, type=pa.int64()),
                "content_id": pa.array(content_ids, type=pa.string()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), self.hist_bins
                ),
            }
        )


# per-worker-process decoder instances for the task-based (stateless) plan:
# construction happens once per worker process, not once per batch
_DECODER_CACHE: dict = {}


def decode_media(
    media_ds, *, concurrency: int = 4, batch_size: int = 64, decoder_cls=FakeMediaDecoder, warm_state=None
):
    """Decode stage over a binary media column.  Small batch_size on purpose:
    rows are wide (whole files); a batch × pool must fit worker heaps.

    Two plans on the decoder's state profile (``warm_state``, default from the
    class's ``NEEDS_WARM_STATE``):

    - warm-state decoders (real codecs) run as an actor POOL — setup in
      ``__init__`` once per actor, work per batch;
    - stateless decoders (the deterministic fakes, md5 demos) run as plain
      TASKS with a per-worker-process cached instance: same once-per-process
      construction, none of the pool's spin-up cost (measured ~2 s per query
      invocation at bench scale vs 0.55 s as tasks — the round-2→3 drift of
      m_media_features was exactly this overhead on a noisier host).
    """
    if warm_state is None:
        warm_state = getattr(decoder_cls, "NEEDS_WARM_STATE", False)
    if warm_state:
        from ..rayops import actor_num_cpus

        return media_ds.map_batches(
            decoder_cls, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency),
            num_cpus=actor_num_cpus(),
            # decode is stateless-per-batch: on actor loss, Ray Data reschedules
            # the batch on a fresh pool actor; Ray's own actor restart would fail
            # anyway once the fused ctor args leave the object store (ray#53727)
            # and logs an error-level line about it on every run
            max_restarts=0,
        )

    def decode_batch(batch: pa.Table) -> pa.Table:
        dec = _DECODER_CACHE.get(decoder_cls)
        if dec is None:
            dec = _DECODER_CACHE[decoder_cls] = decoder_cls()
        return dec(batch)

    return media_ds.map_batches(decode_batch, batch_format="pyarrow", batch_size=batch_size)


def m_media_features(sf_dir: str):
    """Oracle-checkable multimodal plumbing demo: treat documents.text utf-8
    bytes as an opaque payload, run the actor-pool decode stage, emit
    (media_id, n_bytes, md5 hex) — byte-level ops DuckDB can mirror."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(_to_media, batch_format="pyarrow")

    class Md5Decoder(FakeMediaDecoder):
        def __call__(self, batch: pa.Table) -> pa.Table:
            import hashlib as _h

            import pyarrow.compute as pc

            payloads = batch["payload"].to_pylist()
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "n_bytes": pc.cast(pc.coalesce(pc.binary_length(batch["payload"]), 0), pa.int64()),
                    "payload_md5": pa.array([_h.md5(p or b"").hexdigest() for p in payloads], type=pa.string()),
                }
            )

    return decode_media(media, decoder_cls=Md5Decoder, batch_size=256)


M_MEDIA_SQL = """
SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n_bytes, md5(text) AS payload_md5
FROM documents
"""


def _to_media(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # string → binary is a zero-copy Arrow cast; no per-row encode loop
    payload = pc.cast(pc.fill_null(t["text"], ""), pa.binary())
    return pa.table(
        {
            "media_id": t["doc_id"],
            "payload": payload,
            "mime": pa.array(["text/plain"] * len(t), type=pa.string()),
        }
    )


RESIZE_BUCKETS = 8


class ResizeDecoder(FakeMediaDecoder):
    """'Resize' stage stand-in: mean-pool the payload byte stream down to
    RESIZE_BUCKETS levels (the 1-D analog of image downsampling — the real
    stage swaps in PIL's resize, same actor signature and layout).  Emits one
    long-format row per (media_id, bucket) for exact scalar oracle compare."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        B = RESIZE_BUCKETS
        ids, idx, level = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            b = np.frombuffer(p or b"", dtype=np.uint8)
            n = len(b)
            for i in range(B):
                lo, hi = (n * i) // B, (n * (i + 1)) // B
                ids.append(mid)
                idx.append(i)
                level.append(round(float(b[lo:hi].mean()), 6) if hi > lo else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "i": pa.array(idx, type=pa.int64()),
                "level": pa.array(level, type=pa.float64()),
            }
        )


def m_media_resize(sf_dir: str):
    """Resize plumbing demo over the documents-as-media corpus (ASCII text, so
    byte values == DuckDB ``ascii`` code points and the pooling is SQL-exact)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_media(docs.map_batches(_to_media, batch_format="pyarrow"), decoder_cls=ResizeDecoder, batch_size=256)


M_RESIZE_SQL = f"""
WITH t AS (SELECT doc_id, coalesce(text, '') AS s, length(coalesce(text, '')) AS n FROM documents),
b AS (SELECT doc_id, s, n, CAST(unnest(range(0, {RESIZE_BUCKETS})) AS BIGINT) AS i FROM t)
SELECT doc_id AS media_id, i,
       CASE WHEN (n * (i + 1)) // {RESIZE_BUCKETS} > (n * i) // {RESIZE_BUCKETS}
            THEN round(list_avg(list_transform(
                   range(CAST((n * i) // {RESIZE_BUCKETS} AS BIGINT) + 1,
                         CAST((n * (i + 1)) // {RESIZE_BUCKETS} AS BIGINT) + 1),
                   j -> ascii(s[j]))), 6)
            ELSE 0.0 END AS level
FROM b
"""


FRAME_LEN = 16
FRAME_HOP = 64


class FrameSampleDecoder(FakeMediaDecoder):
    """Frame-sampling stage stand-in: take a FRAME_LEN-byte 'frame' every
    FRAME_HOP bytes (the video keyframe-sampling analog; the real stage swaps
    in ffmpeg frame extraction).  Emits (media_id, frame_no, frame_md5)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as _h

        ids, fno, fmd5 = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            b = p or b""
            k = 0
            for off in range(0, max(len(b), 1), FRAME_HOP):
                frame = b[off : off + FRAME_LEN]
                ids.append(mid)
                fno.append(k)
                fmd5.append(_h.md5(frame).hexdigest())
                k += 1
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(fno, type=pa.int64()),
                "frame_md5": pa.array(fmd5, type=pa.string()),
            }
        )


def m_frame_sample(sf_dir: str):
    """Frame-sampling plumbing demo: every doc emits one frame per FRAME_HOP
    bytes (empty docs emit one empty frame — deterministic row count)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_media(docs.map_batches(_to_media, batch_format="pyarrow"), decoder_cls=FrameSampleDecoder, batch_size=256)


M_FRAME_SAMPLE_SQL = f"""
WITH t AS (SELECT doc_id, coalesce(text, '') AS s, length(coalesce(text, '')) AS n FROM documents)
SELECT doc_id AS media_id,
       CAST(unnest(range(0, (greatest(n, 1) + {FRAME_HOP - 1}) // {FRAME_HOP})) AS BIGINT) AS frame_no,
       md5(substr(s, CAST(unnest(range(0, (greatest(n, 1) + {FRAME_HOP - 1}) // {FRAME_HOP})) AS BIGINT) * {FRAME_HOP} + 1, {FRAME_LEN})) AS frame_md5
FROM t
"""


def m_media_dedup(sf_dir: str):
    """Exact dedup of decoded media payloads: keep the min-media_id copy per
    payload md5 — the multimodal twin of d_apply_exact (raw payload bytes
    through the actor-pool decode stage, no text normalization).  ONE range
    shuffle of the slim (md5, media_id) stream via the boundary-aware
    first-per-key kernel; returns the kept rows."""
    from ..rayops import first_per_key

    hashed = m_media_features(sf_dir)
    kept = first_per_key(hashed, "payload_md5", order_col="media_id")
    return kept.select_columns(["media_id", "n_bytes", "payload_md5"])


M_MEDIA_DEDUP_SQL = """
WITH f AS (
  SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n_bytes, md5(text) AS payload_md5
  FROM documents)
SELECT media_id, n_bytes, payload_md5 FROM f
WHERE media_id IN (SELECT min(media_id) FROM f GROUP BY payload_md5)
"""


# -------------------------------------------------- perceptual-hash near-dup
# Banded-Hamming near-dup over a 60-bit per-item media fingerprint.  With a
# REAL decoder the fingerprint is a perceptual hash (pHash/aHash) and pairs
# at small Hamming distance are visually-near-duplicate items; the container
# has no codecs, so the deterministic stand-in fingerprints the payload
# HEADER (first 32 bytes) — items sharing a header are "visually" identical,
# the cheap analog of thumbnail-hash dedup — with md5_number_upper parity so
# the whole pair set is SQL-oracled.  The BLOCKING IS EXACT: 4 disjoint 15-bit
# bands over 60 bits means <= 3 flipped bits always leave one band intact
# (pigeonhole), so band-collision candidates + fused Hamming verify lose
# nothing vs the oracle's brute-force scan.

PHASH_BITS_MASK = (1 << 60) - 1
PHASH_MAX_HAMMING = 3
PHASH_HEADER_BYTES = 32


def m_phash_pairs(sf_dir: str, max_hamming: int = PHASH_MAX_HAMMING):
    """(left_id, right_id, hamming) media pairs with fingerprint Hamming
    distance <= max_hamming.  Plan: actor/task decode stage emits the 60-bit
    fingerprint, 4 x 15-bit band keys block candidates (one range shuffle via
    the blocking kernel), Hamming verification is FUSED into the enumeration
    tasks (broadcast fingerprint map below the threshold, pair join above)."""
    import ray as _ray

    from ..config import BlockingConfig
    from ..functions.hashing import hamming64
    from ..pipelines.dedup import (
        BROADCAST_THRESHOLD_ROWS,
        _broadcast_payload,
        _payload_gather,
    )
    from ..rayops import adaptive_partitions, attach_pair_sides
    from ..stages.blocking import candidate_pairs

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(_to_media, batch_format="pyarrow")

    class PhashDecoder(FakeMediaDecoder):
        def __call__(self, batch: pa.Table) -> pa.Table:
            import hashlib as _h

            payloads = batch["payload"].to_pylist()
            ph = np.fromiter(
                (
                    int.from_bytes(
                        _h.md5((p or b"")[:PHASH_HEADER_BYTES]).digest()[:8], "little"
                    )
                    & PHASH_BITS_MASK
                    for p in payloads
                ),
                dtype=np.int64,
                count=len(payloads),
            )
            return pa.table({"media_id": batch["media_id"], "phash": pa.array(ph, type=pa.int64())})

    hashed = decode_media(media, decoder_cls=PhashDecoder, batch_size=256).materialize()
    n = hashed.count()
    nparts = adaptive_partitions(n)

    def emit_keys(t: pa.Table) -> pa.Table:
        h = t["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        keys, kids = [], []
        for band in range(4):
            part = ((h >> np.uint64(15 * band)) & np.uint64(0x7FFF)).astype(np.int64) | (band << 16)
            keys.append(part)
            kids.append(ids)
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(kids), type=pa.int64()),
            }
        )

    blocks = hashed.map_batches(emit_keys, batch_format="pyarrow")

    def emit(li, ri, hl, hr) -> pa.Table:
        d = hamming64(np.asarray(hl, dtype=np.uint64), np.asarray(hr, dtype=np.uint64))
        keep = d <= max_hamming
        return pa.table(
            {
                "left_id": pa.array(np.asarray(li, dtype=np.int64)[keep], type=pa.int64()),
                "right_id": pa.array(np.asarray(ri, dtype=np.int64)[keep], type=pa.int64()),
                "hamming": pa.array(d[keep].astype(np.int64), type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "hamming": pa.array([], type=pa.int64()),
        }
    )
    if n <= BROADCAST_THRESHOLD_ROWS:
        pref = _ray.put(_broadcast_payload(hashed, "media_id", ("phash",)))

        def verify_pairs(li, ri) -> pa.Table:
            pm = _ray.get(pref)
            if len(li) == 0 or pm is None:
                return empty
            return emit(li, ri, _payload_gather(pm, li, "phash"), _payload_gather(pm, ri, "phash"))

        out = candidate_pairs(
            blocks, BlockingConfig(max_block_size=500), num_partitions=nparts, pair_fn=verify_pairs
        )
    else:
        pairs = candidate_pairs(blocks, BlockingConfig(max_block_size=500), num_partitions=nparts)
        enriched = attach_pair_sides(
            pairs, hashed, id_col="media_id", cols=("phash",), num_partitions=nparts
        )

        def verify_j(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return empty
            return emit(
                t["left_id"].to_numpy(zero_copy_only=False),
                t["right_id"].to_numpy(zero_copy_only=False),
                t["l_phash"].to_numpy(zero_copy_only=False),
                t["r_phash"].to_numpy(zero_copy_only=False),
            )

        out = enriched.map_batches(verify_j, batch_format="pyarrow")

    # a zero-pair corpus yields a dataset with no blocks, whose to_pandas()
    # has NO columns (Ray drops empty input blocks); the pair set is tiny by
    # construction, so count + a plain Arrow empty keeps the schema stable
    out = out.materialize()
    return empty if out.count() == 0 else out


M_PHASH_PAIRS_SQL = f"""
WITH f AS (
  SELECT doc_id AS media_id,
         CAST(md5_number_upper(substr(coalesce(text, ''), 1, {PHASH_HEADER_BYTES})) & {PHASH_BITS_MASK} AS BIGINT) AS phash
  FROM documents)
SELECT a.media_id AS left_id, b.media_id AS right_id,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM f a JOIN f b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
"""
