"""Multimodal column operators: opaque binary blobs + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata structs — exactly the reference's bytes/wrapper mapping
(SURVEY §1.2: bytes -> BinaryType) extended with the operators a
training-data pipeline needs:

* :func:`blob_metadata` — sniff + size + content digest. Pure JVM
  built-ins (whole-stage codegen); zero Python in the row path.
* :func:`frame_sample` — fixed-size frame extraction with stride
  (the video keyframe-sampling shape). Pure JVM built-ins: sequence +
  explode + substring arithmetic; scales as a narrow map + explode.
* :func:`decode_image_features` — per-image feature extraction via an
  Arrow-batched ``mapInPandas`` UDF. **The actual codec is a STUB**:
  real decoders (PIL / libav) are not installed in this environment,
  so decoding targets the deterministic FAKE image format below and
  :func:`decode_real_image` raises ``NotImplementedError``. The
  Spark-side plumbing — schema, batch shape, vectorized numpy body,
  partition-local execution — is real and tested; swapping in a real
  codec changes only the inner function.

Fake image format (deterministic, codec-free):
``b"FIMG"`` magic, then payload bytes interpreted as 8-bit grayscale
pixels in row-major order with fixed width :data:`FAKE_IMAGE_WIDTH`
(last row ragged). This lets correctness oracles recompute every
feature byte-exactly in SQL.

Scale notes: all three operators are shuffle-free narrow maps; frame
sampling explodes at most ``len/frame_bytes`` rows per blob; the
Pandas UDF path is Arrow-batched with numpy vectorization inside.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

FAKE_IMAGE_MAGIC = b"FIMG"
FAKE_IMAGE_MAGIC_HEX = "46494D47"
FAKE_IMAGE_WIDTH = 16
FRAME_BYTES = 32


def is_fake_image(blob: Column) -> Column:
    return F.hex(blob).startswith(FAKE_IMAGE_MAGIC_HEX)


def blob_metadata(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column: media sniff by
    magic bytes, size, and a payload digest (md5 over the hex
    rendering — engine-portable). JVM-only; one narrow projection."""
    blob = F.col(blob_col)
    payload_hex = F.when(
        is_fake_image(blob), F.substring(F.hex(blob), 9, 2_000_000_000)
    ).otherwise(F.hex(blob))
    return df.select(
        F.col(id_col),
        F.when(is_fake_image(blob), F.lit("image/fake"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("media_type"),
        F.length(blob).cast("long").alias("size_bytes"),
        (F.length(payload_hex) / 2).cast("long").alias("payload_bytes"),
        F.md5(payload_hex).alias("payload_md5"),
    )


def frame_sample(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    frame_bytes: int = FRAME_BYTES,
    every: int = 2,
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from each blob's
    payload (keyframe sampling over an opaque video-ish column).

    All hex-string arithmetic on JVM built-ins: a ``sequence`` of
    frame indices explodes to one row per sampled frame; the frame's
    bytes come from substring arithmetic. Narrow map + explode; no
    shuffle, no Python.
    """
    hx = frame_bytes * 2  # hex chars per frame
    blob = F.col(blob_col)
    payload_hex = F.when(
        is_fake_image(blob), F.substring(F.hex(blob), 9, 2_000_000_000)
    ).otherwise(F.hex(blob))
    src = df.select(F.col(id_col), payload_hex.alias("ph"))
    n_frames = F.ceil(F.length("ph") / hx).cast("int")
    frames = src.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        F.col("ph"),
    ).filter(F.col("frame_idx") % every == 0)
    frame_hex = F.substring(F.col("ph"), F.col("frame_idx") * hx + 1, hx)
    return frames.select(
        F.col(id_col),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.length(frame_hex) / 2).cast("long").alias("frame_bytes"),
        F.md5(frame_hex).alias("frame_md5"),
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
    ]
)


def decode_real_image(blob: bytes) -> dict:
    """Real-codec decode — STUB. This environment has no image
    libraries installed; plug PIL/opencv here in production."""
    raise NotImplementedError(
        "real image codecs are not available in this environment; "
        "use the FIMG fake format (decode_image_features)"
    )


def decode_image_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = FAKE_IMAGE_WIDTH,
) -> DataFrame:
    """Grayscale feature extraction over fake-format images via an
    Arrow-batched ``mapInPandas`` UDF (the real-codec body would slot
    into the same plumbing; see :func:`decode_real_image`).

    Non-image blobs (no magic) produce null features — they flow
    through the same schema so the operator is total.

    Scale: partition-local, Arrow-batched, numpy-vectorized per blob;
    output is one row per input row (no explosion).
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "doc_id": batch["doc_id"],
                "width": [],
                "height": [],
                "n_pixels": [],
                "pixel_sum": [],
                "pixel_max": [],
            }
            for raw in batch["blob"]:
                data = bytes(raw)
                if not data.startswith(FAKE_IMAGE_MAGIC):
                    for k in ("width", "height", "n_pixels", "pixel_sum", "pixel_max"):
                        out[k].append(None)
                    continue
                px = np.frombuffer(data, dtype=np.uint8, offset=len(FAKE_IMAGE_MAGIC))
                out["width"].append(width)
                out["height"].append(-(-len(px) // width))  # ceil, ragged last row
                out["n_pixels"].append(len(px))
                out["pixel_sum"].append(int(px.sum()) if len(px) else 0)
                out["pixel_max"].append(int(px.max()) if len(px) else 0)
            yield pd.DataFrame(out)

    return src.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("new_width", T.IntegerType(), True),
        T.StructField("new_height", T.LongType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_image(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = FAKE_IMAGE_WIDTH,
    factor: int = 2,
) -> DataFrame:
    """Nearest-neighbor column downsampling of fake-format images:
    keep every ``factor``-th pixel column (ragged trailing row
    dropped — documented truncation), emitting the resized payload as
    a new binary column. Same Arrow-batched ``mapInPandas`` plumbing
    as :func:`decode_image_features`; a real codec slots into the
    same inner function.

    Non-image blobs pass through as nulls (total operator).

    Scale: partition-local narrow map, one strided numpy view per
    blob — no shuffle, output strictly smaller than input.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"doc_id": batch["doc_id"], "new_width": [], "new_height": [], "resized": []}
            for raw in batch["blob"]:
                data = bytes(raw)
                if not data.startswith(FAKE_IMAGE_MAGIC):
                    out["new_width"].append(None)
                    out["new_height"].append(None)
                    out["resized"].append(None)
                    continue
                px = np.frombuffer(data, dtype=np.uint8, offset=len(FAKE_IMAGE_MAGIC))
                height = len(px) // width
                grid = px[: height * width].reshape(height, width)[:, ::factor]
                out["new_width"].append(-(-width // factor))
                out["new_height"].append(height)
                out["resized"].append(grid.tobytes())
            yield pd.DataFrame(out)

    return src.mapInPandas(resize, RESIZE_SCHEMA)


FAKE_AUDIO_MAGIC = b"FAUD"
FAKE_AUDIO_MAGIC_HEX = "46415544"
AUDIO_WINDOW = 64

AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("win_idx", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("energy_sum", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def decode_real_audio(blob: bytes) -> dict:
    """Real-codec decode — STUB. No audio libraries (libav/soundfile)
    in this environment; plug them here in production."""
    raise NotImplementedError(
        "real audio codecs are not available in this environment; "
        "use the FAUD fake format (audio_window_features)"
    )


def audio_window_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    window: int = AUDIO_WINDOW,
) -> DataFrame:
    """Windowed audio features over fake-format (``FAUD`` magic) blobs
    via an Arrow-batched ``mapInPandas`` UDF — the audio analogue of
    :func:`decode_image_features` (same plumbing; a real PCM decoder
    slots into the inner function, see :func:`decode_real_audio`).

    The payload is read as 8-bit unsigned PCM centered at 128. Per
    ``window``-sample window (last ragged): sample count, energy
    (sum of squared deviations — integer-exact, so any SQL engine
    reproduces it bit-for-bit), and zero crossings (adjacent samples
    straddling the midline, window-local). Non-audio blobs emit no
    rows (frame-level operators are per-decoded-unit, like
    :func:`frame_sample`).

    Scale: partition-local narrow map; output fans out by
    ``ceil(samples/window)`` rows per blob — bounded and small.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, wins, ns, es, zs = [], [], [], [], []
            for doc_id, raw in zip(batch["doc_id"], batch["blob"]):
                data = bytes(raw)
                if not data.startswith(FAKE_AUDIO_MAGIC):
                    continue
                s = np.frombuffer(
                    data, dtype=np.uint8, offset=len(FAKE_AUDIO_MAGIC)
                ).astype(np.int64)
                for w in range(-(-len(s) // window) if len(s) else 0):
                    seg = s[w * window : (w + 1) * window]
                    dev = seg - 128
                    ids.append(doc_id)
                    wins.append(w)
                    ns.append(len(seg))
                    es.append(int((dev * dev).sum()))
                    zs.append(int(((seg[1:] >= 128) != (seg[:-1] >= 128)).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": wins,
                    "n_samples": ns,
                    "energy_sum": es,
                    "zero_crossings": zs,
                }
            )

    return src.mapInPandas(extract, AUDIO_WINDOW_SCHEMA)


#: Scene-cut threshold on the per-frame signature byte (0..255).
SCENE_CUT_THRESHOLD = 64


def scene_cuts(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    frame_bytes: int = FRAME_BYTES,
    threshold: int = SCENE_CUT_THRESHOLD,
) -> DataFrame:
    """Scene-change detection over a video-ish blob: one signature
    byte per fixed-size frame (the stub for a real frame-histogram
    distance — the codec is deterministic-stubbed like the rest of
    the multimodal pack), a cut wherever the signature jumps by
    >= ``threshold`` vs the previous frame, and a running cut count
    that numbers each frame's scene — the keyframe/segmentation pass
    a video training pipeline runs before captioning or sampling.

    Scale: frame explode is a narrow map; the only shuffle keys on the
    video id for the lag/cumsum window — state per video is one row,
    and 100 TB of video shards by id with no skew (frame counts are
    bounded per blob).

    Output: id, frame_idx, sig (0..255), is_cut, scene_id (1-based).
    """
    from pyspark.sql import Window

    hx = frame_bytes * 2
    blob = F.col(blob_col)
    payload_hex = F.when(
        is_fake_image(blob), F.substring(F.hex(blob), 9, 2_000_000_000)
    ).otherwise(F.hex(blob))
    src = df.select(F.col(id_col), payload_hex.alias("ph"))
    n_frames = F.ceil(F.length("ph") / hx).cast("int")
    frames = src.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        F.conv(F.substring(F.col("ph"), F.col("frame_idx") * hx + 1, 2), 16, 10)
        .cast("int")
        .alias("sig"),
    )
    w = Window.partitionBy(id_col).orderBy("frame_idx")
    prev = F.lag("sig").over(w)
    is_cut = prev.isNull() | (F.abs(F.col("sig") - prev) >= threshold)
    cum = Window.partitionBy(id_col).orderBy("frame_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return frames.select(
        F.col(id_col),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "sig",
        is_cut.alias("is_cut"),
        F.sum(is_cut.cast("long")).over(cum).alias("scene_id"),
    )


#: aHash grid: the perceptual hash reads this many leading pixels
#: (a real codec would resize to an 8x8 luma grid first; the stub
#: reads the first 64 payload bytes, zero-padded — same shape, no
#: codec dependency).
PHASH_CELLS = 64

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ahash", T.StringType(), True),
    ]
)


def image_phash(
    df: DataFrame, id_col: str, blob_col: str, cells: int = PHASH_CELLS
) -> DataFrame:
    """Perceptual average-hash (aHash) per image: threshold each of
    ``cells`` grid values at the (floor) mean, emit the bit string.
    Near-duplicate images — re-encodes, minor edits — land on the
    same or near-identical hash; identical hashes group without any
    pairwise comparison. Same Arrow-batched ``mapInPandas`` plumbing
    as the other stub-codec operators (a real decoder producing an
    8x8 luma grid slots into the inner function); the hash is a
    64-char '0'/'1' string, sidestepping signed-64-bit overflow and
    portable to any engine.

    Non-image blobs emit a null hash (total operator).

    Scale: narrow map, zero shuffles; downstream grouping is one
    hash-groupBy on a uniformly distributed key — exactly the exact-
    dedup shape, never all-pairs.
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            hashes = []
            for raw in batch["blob"]:
                data = bytes(raw)
                if not data.startswith(FAKE_IMAGE_MAGIC):
                    hashes.append(None)
                    continue
                px = np.frombuffer(data, dtype=np.uint8, offset=len(FAKE_IMAGE_MAGIC))
                v = np.zeros(cells, dtype=np.int64)
                n = min(cells, len(px))
                v[:n] = px[:n]
                mean_floor = int(v.sum()) // cells
                hashes.append("".join("1" if x > mean_floor else "0" for x in v))
            yield pd.DataFrame({"doc_id": batch["doc_id"], "ahash": hashes})

    return src.mapInPandas(extract, PHASH_SCHEMA)


def phash_duplicate_groups(
    df: DataFrame, id_col: str, blob_col: str, cells: int = PHASH_CELLS
) -> DataFrame:
    """Images sharing an identical perceptual hash: one row per hash
    with the canonical (minimum) id and the group size — the image-
    column counterpart of text exact dedup (hamming-k probing over
    hash chunks reuses the SimHash banding pattern unchanged)."""
    hashed = image_phash(df, id_col, blob_col, cells).filter(
        F.col("ahash").isNotNull()
    )
    return hashed.groupBy("ahash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_images"),
    )
