"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not in the reference (text-only), but first-class for a training-data
pipeline.  Design: media stays an opaque ``binary`` column (the pages
table's input_hint already carries ``html binary``); metadata extraction
is pure Catalyst; decode / feature-extract / resize / frame-sample are
``mapInPandas`` stages whose Spark-side plumbing (schema, batching,
partition flow) is real and tested, while the codec call itself is
gated behind a try-import - the image/audio libraries are absent in this
container, so without them a clearly-marked deterministic fake decoder
runs instead (tests pin its output), and `strict=True` raises
NotImplementedError as the marker that a real codec is required.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

# magic-byte prefixes -> sniffed container type (pure-SQL lookup)
MAGIC = (
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("25504446", "pdf"),
    ("52494646", "riff"),        # wav/avi
    ("1A45DFA3", "matroska"),    # mkv/webm
    ("3C68746D", "html"),        # "<htm"
    ("3C21444F", "html"),        # "<!DO"
)

DECODE_SCHEMA = ("doc_id long, width int, height int, channels int, "
                 "format string, ok boolean")
FRAME_SCHEMA = ("doc_id long, frame_idx int, ts_ms long, frame binary")


def media_meta(df: DataFrame, bin_col: str = "html",
               id_col: str = "doc_id") -> DataFrame:
    """Typed metadata per media row - size, magic bytes, sniffed type.
    Catalyst-only (hex + substring on the binary column)."""
    magic = F.upper(F.hex(F.expr(f"substring({bin_col}, 1, 4)")))
    sniff = F.lit("unknown")
    for prefix, kind in reversed(MAGIC):
        sniff = F.when(magic.startswith(prefix), F.lit(kind)).otherwise(sniff)
    return df.select(
        id_col,
        F.length(F.col(bin_col)).alias("size_bytes"),
        magic.alias("magic_hex"),
        sniff.alias("media_type"),
    )


def _try_real_decoder():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except Exception:
        return None


def decode_images(df: DataFrame, bin_col: str = "html",
                  id_col: str = "doc_id", strict: bool = False) -> DataFrame:
    """Image decode stage over mapInPandas: one Arrow batch of binaries in,
    one batch of (width, height, channels, format) out.

    With Pillow installed the real decoder runs; otherwise a DETERMINISTIC
    FAKE derives dimensions from the byte length (documented stub - the
    Spark plumbing, schema and batch shape are the tested contract).
    strict=True raises NotImplementedError when no codec is available."""
    pil = _try_real_decoder()
    if strict and pil is None:
        raise NotImplementedError(
            "real image decoding requires Pillow; install it or use the "
            "deterministic stub (strict=False)")

    def batches(it: Iterator):
        import io as _io

        import pandas as pd
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    rows.append((doc_id, None, None, None, None, False))
                    continue
                if pil is not None:
                    try:
                        img = pil.open(_io.BytesIO(bytes(blob)))
                        rows.append((doc_id, img.width, img.height,
                                     len(img.getbands()), img.format, True))
                        continue
                    except Exception:
                        rows.append((doc_id, None, None, None, None, False))
                        continue
                # deterministic fake: dimensions derived from byte length
                n = len(blob)
                rows.append((doc_id, n % 640 + 1, n % 480 + 1, 3,
                             "FAKE", True))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "channels", "format", "ok"])

    return df.select(id_col, bin_col).mapInPandas(batches, DECODE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 3, bin_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling stage (stub codec): emits n_frames rows per
    media blob with deterministic byte-slice "frames" - exercises the
    1->N mapInPandas fan-out shape a real ffmpeg-backed sampler uses."""

    def batches(it: Iterator):
        import pandas as pd
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                step = max(len(b) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    rows.append((doc_id, i, i * 40, b[i * step:(i + 1) * step]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "ts_ms", "frame"])

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = ("doc_id long, width int, height int, pixels binary, "
                 "ok boolean")
FEATURE_SCHEMA = "doc_id long, embedding array<float>, ok boolean"


def resize_images(df: DataFrame, width: int = 224, height: int = 224,
                  bin_col: str = "html", id_col: str = "doc_id",
                  strict: bool = False) -> DataFrame:
    """Image resize stage over mapInPandas (the standard pre-training
    normalization step): binary in, fixed-size raw pixel buffer out.
    With Pillow present the real resample runs; otherwise the documented
    deterministic fake tiles the input bytes to exactly
    width*height*3 bytes - the schema, batch flow and output SIZE contract
    (len(pixels) == w*h*3) are the tested Spark plumbing.
    strict=True raises NotImplementedError when no codec is available."""
    pil = _try_real_decoder()
    if strict and pil is None:
        raise NotImplementedError(
            "real image resizing requires Pillow; install it or use the "
            "deterministic stub (strict=False)")
    out_len = width * height * 3

    def batches(it: Iterator):
        import io as _io

        import pandas as pd
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    rows.append((doc_id, width, height, None, False))
                    continue
                b = bytes(blob)
                if pil is not None:
                    try:
                        img = pil.open(_io.BytesIO(b)).convert("RGB") \
                            .resize((width, height))
                        rows.append((doc_id, width, height,
                                     img.tobytes(), True))
                        continue
                    except Exception:
                        rows.append((doc_id, width, height, None, False))
                        continue
                tiled = (b * (out_len // max(len(b), 1) + 1))[:out_len]
                rows.append((doc_id, width, height, tiled, True))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "pixels", "ok"])

    return df.select(id_col, bin_col).mapInPandas(batches, RESIZE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 64,
                     bin_col: str = "html", id_col: str = "doc_id",
                     strict: bool = False) -> DataFrame:
    """Feature-extraction stage (embedding per media blob) over
    mapInPandas - the shape a real vision/audio encoder serving path uses
    (model loaded once per worker, Arrow batches through it).  No encoder
    is installable here, so strict=True raises and the default is a
    DETERMINISTIC fake: a seeded byte-histogram projection - stable across
    runs/executors so downstream ANN tests can pin results.  Output plugs
    directly into ccspark.similarity (array<float> embedding column)."""
    if strict:
        raise NotImplementedError(
            "real feature extraction requires a vision/audio encoder "
            "(e.g. torch + an ONNX model); the deterministic stub runs "
            "with strict=False")

    def batches(it: Iterator):
        import numpy as np
        import pandas as pd
        for pdf in it:
            ids, vecs, oks = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                ids.append(doc_id)
                if blob is None:
                    vecs.append(None)
                    oks.append(False)
                    continue
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype("float32")
                norm = float(np.linalg.norm(hist))
                vecs.append((hist / norm if norm else hist).tolist())
                oks.append(True)
            yield pd.DataFrame(
                {"doc_id": ids, "embedding": vecs, "ok": oks})

    return df.select(id_col, bin_col).mapInPandas(batches, FEATURE_SCHEMA)
