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


def payload_metadata(assets: DataFrame) -> DataFrame:
    """Metadata-only scan: never reads the payload column (verify with
    .explain → ReadSchema excludes 'payload')."""
    return assets.select("asset_id", "n_bytes", "mime")
