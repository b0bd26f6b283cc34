"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded/feature-extracted by actor-pool stages.

The image/audio codecs are not available in this environment, so the
decode step is a clearly-marked deterministic stub
(:class:`StubDecoder`) — but the Ray-side plumbing is real and tested:
binary columns ride Arrow blocks zero-copy, batches are sized small
for wide rows, the stage is an actor pool with per-actor setup, and
the output layout (fixed-size feature vectors + scalar metadata) is
what a real decoder would produce.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

from .util import tbl


def synthesize_media(sf_dir: str):
    """Derive a deterministic binary 'media' column from documents:
    payload = a seeded pseudo-image (bytes derived from the text) +
    typed metadata columns (media_type, width, height). Stands in for
    a real `(doc_id, payload, meta)` media table."""
    ds = tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        payloads, widths, heights = [], [], []
        for i, t in zip(ids, texts):
            seed = hashlib.blake2b(f"{i}".encode(), digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(seed, "big"))
            w = int(8 + (i % 8))
            h = int(8 + (i % 5))
            payloads.append(rng.integers(0, 256, w * h, dtype=np.uint8).tobytes())
            widths.append(w)
            heights.append(h)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(payloads, type=pa.binary()),
                "media_type": pa.array(["image/fake"] * len(ids)),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
            }
        )

    return ds.map_batches(make, batch_format="pyarrow")


class StubDecoder:
    """STUB: a real deployment would decode the payload with an image
    library here (PIL/opencv are not in this container). The stub
    'decodes' deterministically: mean/std over raw bytes + a CRC — the
    actor signature, batch sizing and output schema are the real
    contract. Raises NotImplementedError for media types a real
    decoder wouldn't fake."""

    REAL_DECODE = False

    def __init__(self, feature_dim: int = 4) -> None:
        self.feature_dim = feature_dim

    def decode_features(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type not in ("image/fake",):
            raise NotImplementedError(
                f"no codec for {media_type!r} in this environment"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)
        return np.array(
            [
                float(arr.mean()) if len(arr) else 0.0,
                float(arr.std()) if len(arr) else 0.0,
                float(len(arr)),
                float(zlib.crc32(payload) % 1_000_000),
            ],
            dtype=np.float32,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack(
            [
                self.decode_features(p, m)
                for p, m in zip(
                    batch.column("payload").to_pylist(),
                    batch.column("media_type").to_pylist(),
                )
            ]
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(
                    [len(p) for p in batch.column("payload").to_pylist()],
                    type=pa.int64(),
                ),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float32()), self.feature_dim
                ),
            }
        )


def media_features(sf_dir: str):
    """Binary-column pipeline: synthesize → actor-pool decode with
    SMALL batches (wide binary rows need a low batch_size so
    batch × concurrency fits the heap — the memory-aware rule)."""
    ds = synthesize_media(sf_dir)
    from .util import cached

    feats = ds.map_batches(
        lambda b: cached("stub-decoder", StubDecoder)(b),
        batch_format="pyarrow",
        batch_size=64,
    )
    return feats.sort("doc_id")


def frame_sample(sf_dir: str, frame_bytes: int = 16, every_k: int = 4):
    """Frame-sampling plumbing for video-ish payloads: treat the
    binary payload as fixed-size frames, keep every k-th frame, emit
    one row per sampled frame with a per-frame feature (mean byte).
    The decode itself is the deterministic stub; the flat_map-style
    row expansion, frame indexing and output layout are the real
    contract a video pipeline needs."""
    ds = synthesize_media(sf_dir)

    def sample(batch: pa.Table) -> pa.Table:
        doc_ids, frame_idx, means = [], [], []
        for did, payload in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            n_frames = len(payload) // frame_bytes
            for fi in range(0, n_frames, every_k):
                frame = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                doc_ids.append(did)
                frame_idx.append(fi)
                means.append(float(np.frombuffer(frame, dtype=np.uint8).mean()))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame_mean": pa.array(np.round(means, 3), type=pa.float64()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=64).sort(
        ["doc_id", "frame_idx"]
    )


def resize_media(sf_dir: str, out_w: int = 4, out_h: int = 4):
    """Resize plumbing: nearest-neighbor downsample of the fake w×h
    payload to out_w×out_h (a real deployment swaps the numpy kernel
    for a codec-backed resize; batch sizing and schema are the
    contract). Emits the resized payload + a checksum."""
    ds = synthesize_media(sf_dir)

    def resize(batch: pa.Table) -> pa.Table:
        payloads, sums = [], []
        for p, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = np.frombuffer(p, dtype=np.uint8).reshape(h, w)
            yi = (np.arange(out_h) * h) // out_h
            xi = (np.arange(out_w) * w) // out_w
            small = img[np.ix_(yi, xi)]
            payloads.append(small.tobytes())
            sums.append(int(small.sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "resized": pa.array(payloads, type=pa.binary()),
                "checksum": pa.array(sums, type=pa.int64()),
            }
        )

    return ds.map_batches(resize, batch_format="pyarrow", batch_size=64).sort("doc_id")


def media_byte_totals(sf_dir: str):
    """Scalar roll-up over the media table (SQL-checkable against the
    deterministic synthesis): doc_id, n_bytes = width*height."""
    ds = synthesize_media(sf_dir)

    def sizes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pc.cast(
                    pc.multiply(batch["width"], batch["height"]), pa.int64()
                ),
            }
        )

    return ds.map_batches(sizes, batch_format="pyarrow").sort("doc_id")
