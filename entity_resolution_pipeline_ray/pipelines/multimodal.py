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
    """The production decode stage — requires PIL/ffmpeg, absent here.

    STUB: raises NotImplementedError.  At scale this is an actor pool
    (``map_batches(RealMediaDecoder, concurrency=(1, N), batch_size=small)``)
    because decoders hold codec state and batches of wide binary rows must be
    small (batch bytes, not batch rows, bound worker memory).
    """

    def __init__(self):
        raise NotImplementedError(
            "media decode libraries (PIL/ffmpeg) are not available in this environment; "
            "use FakeMediaDecoder for plumbing tests"
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


def decode_media(media_ds, *, concurrency: int = 4, batch_size: int = 64, decoder_cls=FakeMediaDecoder):
    """Actor-pool decode stage over a binary media column.  Small batch_size on
    purpose: rows are wide (whole files); a batch × pool must fit worker heaps."""
    from ..rayops import actor_num_cpus

    return media_ds.map_batches(
        decoder_cls, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency),
        num_cpus=actor_num_cpus(),
        # decode is stateless-per-batch: on actor loss, Ray Data reschedules the
        # batch on a fresh pool actor; Ray's own actor restart would fail anyway
        # once the fused ctor args leave the object store (ray#53727) and logs
        # an error-level line about it on every run
        max_restarts=0,
    )


def m_media_features(sf_dir: str):
    """Oracle-checkable multimodal plumbing demo: treat documents.text utf-8
    bytes as an opaque payload, run the actor-pool decode stage, emit
    (media_id, n_bytes, md5 hex) — byte-level ops DuckDB can mirror."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [x.encode("utf-8") if x else b"" for x in t["text"].to_pylist()]
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.binary()),
                "mime": pa.array(["text/plain"] * len(t), type=pa.string()),
            }
        )

    media = docs.map_batches(to_media, batch_format="pyarrow")

    class Md5Decoder(FakeMediaDecoder):
        def __call__(self, batch: pa.Table) -> pa.Table:
            import hashlib as _h

            payloads = batch["payload"].to_pylist()
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "n_bytes": pa.array([len(p or b"") for p in payloads], type=pa.int64()),
                    "payload_md5": pa.array([_h.md5(p or b"").hexdigest() for p in payloads], type=pa.string()),
                }
            )

    return decode_media(media, decoder_cls=Md5Decoder, batch_size=256)


M_MEDIA_SQL = """
SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n_bytes, md5(text) AS payload_md5
FROM documents
"""
