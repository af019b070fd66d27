"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/feature-extraction kernels are STUBS in this container (no
image/audio libs available — see DETERMINISTIC_FAKE) but the Spark-side
plumbing is real and tested: schema contracts, batch iteration shape,
partition-size control, and the metadata fast-path that never touches the
payload bytes (column pruning keeps the binary column out of metadata-only
scans).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FRAME_SCHEMA = ("asset_id long, frame_idx int, height int, width int, "
                "feat_mean double, feat_hash string")


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata from a
    text table (deterministic stand-in for real image/audio bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires an imaging library not present in this
    container. The pipeline substitutes _fake_decode under test."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow); "
        "not available in this environment — use deterministic_fake=True")


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake: payload bytes → pseudo 8×8 'image'."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8)


def extract_frames(assets: DataFrame, frames_per_asset: int = 2,
                   deterministic_fake: bool = True) -> DataFrame:
    """Frame-sample + feature-extract over binary payloads via mapInPandas
    (Arrow batches; the binary column stays columnar end-to-end)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        decode = _fake_decode if deterministic_fake else decode_image
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode(bytes(payload))
                for fi in range(frames_per_asset):
                    frame = np.roll(img, fi, axis=0)
                    out.append((int(aid), fi, frame.shape[0], frame.shape[1],
                                float(frame.mean()),
                                hashlib.md5(frame.tobytes()).hexdigest()))
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "height",
                                             "width", "feat_mean", "feat_hash"])

    return assets.select("asset_id", "payload").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = "asset_id long, height int, width int, pixels binary"


def resize_images(assets: DataFrame, height: int = 4, width: int = 4,
                  deterministic_fake: bool = True) -> DataFrame:
    """Nearest-neighbor resize over binary payloads via mapInPandas. The
    index arithmetic (the real resize semantics) is genuine numpy; only the
    byte→image decode is the environment stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if deterministic_fake else decode_image
        ys = None
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode(bytes(payload))
                if ys is None or ys[0].size != height:
                    ys = (np.minimum((np.arange(height) * img.shape[0]) // height,
                                     img.shape[0] - 1),
                          np.minimum((np.arange(width) * img.shape[1]) // width,
                                     img.shape[1] - 1))
                resized = img[np.ix_(ys[0], ys[1])]
                out.append((int(aid), height, width, resized.tobytes()))
            yield pd.DataFrame(out, columns=["asset_id", "height", "width",
                                             "pixels"])

    return assets.select("asset_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def extract_embeddings(assets: DataFrame, dim: int = 16,
                       deterministic_fake: bool = True) -> DataFrame:
    """Feature-extract: payload → unit-norm float32 embedding (the vector
    that feeds ops.similarity ANN / ops.dedup.embedding_cosine_pairs). The
    kernel here is a deterministic byte-histogram fake; the plumbing —
    Arrow batches in, array<float> column out — is the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float64) \
                    if b.size else np.ones(dim, dtype=np.float64)
                norm = float(np.linalg.norm(hist)) or 1.0
                ids.append(int(aid))
                vecs.append([float(x) for x in hist / norm])
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return assets.select("asset_id", "payload").mapInPandas(
        run, "vec_id long, embedding array<float>")


def payload_metadata(assets: DataFrame) -> DataFrame:
    """Metadata-only scan: never reads the payload column (verify with
    .explain → ReadSchema excludes 'payload')."""
    return assets.select("asset_id", "n_bytes", "mime")
