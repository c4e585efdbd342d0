"""Multimodal columns (north star Q27): images/audio/video as opaque
``binary`` columns with typed metadata.

The decode step itself requires codec libraries (PIL/ffmpeg) that are
NOT in this environment — it is stubbed behind ``decode_backend``:

  - ``"pil"``  — the production path; raises NotImplementedError with
    install guidance if PIL is absent (clearly-marked stub).
  - ``"fake"`` — a deterministic stand-in (dimensions/stats derived
    from the byte content via sha256) so the Spark-side plumbing —
    schema, Arrow batch shape, partitioning, UDF signature — is real
    and tested end-to-end.

Everything around the decode is real: the ``binaryFile`` source,
magic-byte format sniffing (pure JVM expressions), and the
``mapInPandas`` batch contract a real decoder drops into.

Scale notes: binary payloads dominate row size — always project
``content`` away before any shuffle/join (the reference keeps image
bytes out of its table entirely, storing URLs; we support both).
``binaryFile`` parallelizes per file; for millions of small images the
scale path is consolidated parquet with a binary column (written by
the ETL), not a million tiny files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: magic prefixes -> format label (hex, uppercase)
_MAGIC = {
    "FFD8FF": "jpeg",
    "89504E47": "png",
    "47494638": "gif",
    "52494646": "webp_or_riff",
    "424D": "bmp",
}

IMAGE_META_SCHEMA = (
    "path string, fmt string, n_bytes long, width int, height int, channels int, mean_pixel double"
)


def read_binary(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest files as (path, modificationTime, length, content) via the
    binaryFile source (Q27)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def sniff_format(content_col: str = "content") -> F.Column:
    """Container format from magic bytes — pure JVM expressions, no
    decode, safe on truncated/corrupt payloads."""
    head = F.upper(F.hex(F.substring(F.col(content_col), 1, 4)))
    out = F.lit("unknown")
    for magic, fmt in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        out = F.when(head.startswith(magic), F.lit(fmt)).otherwise(out)
    return out


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    decode_backend: str = "fake",
) -> DataFrame:
    """Decode image bytes -> typed metadata + pixel stats.

    Arrow-batched mapInPandas; one input row -> one output row. The
    ``fake`` backend is deterministic from the byte content (sha256),
    making the full pipeline testable without codec libraries.
    ``auto`` resolves DRIVER-side to ``pil`` when Pillow imports and
    ``fake`` otherwise — the opportunistic real-decode path; it assumes
    driver and executors share the Python environment (true for every
    standard Spark deployment mode).
    """
    if decode_backend not in ("fake", "pil", "auto"):
        raise ValueError("decode_backend must be 'fake', 'pil', or 'auto'")
    if decode_backend == "auto":
        try:
            import PIL  # type: ignore # noqa: F401

            decode_backend = "pil"
        except ImportError:
            decode_backend = "fake"
    pruned = df.select(path_col, content_col)

    def decode(batches):
        import hashlib

        import pandas as pd

        if decode_backend == "pil":
            try:
                from PIL import Image  # type: ignore # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "decode_backend='pil' requires Pillow (pip install pillow); "
                    "use decode_backend='fake' for plumbing tests"
                ) from e

        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    out.append((path, "unknown", 0, None, None, None, None))
                    continue
                b = bytes(content)
                if decode_backend == "pil":  # pragma: no cover - env without PIL
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(b))
                    w, h = img.size
                    channels = len(img.getbands())
                    import numpy as np

                    mean_pixel = float(np.asarray(img).mean())
                    fmt = (img.format or "unknown").lower()
                else:
                    h256 = hashlib.sha256(b).digest()
                    w = 64 + h256[0] % 192
                    h = 64 + h256[1] % 192
                    channels = 3
                    mean_pixel = round(h256[2] / 255.0 * 255, 4)
                    fmt = _sniff_py(b)
                out.append((path, fmt, len(b), w, h, channels, mean_pixel))
            yield pd.DataFrame(
                out,
                columns=["path", "fmt", "n_bytes", "width", "height", "channels", "mean_pixel"],
            )

    return pruned.mapInPandas(decode, IMAGE_META_SCHEMA)


def _sniff_py(b: bytes) -> str:
    hexhead = b[:4].hex().upper()
    for magic, fmt in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        if hexhead.startswith(magic):
            return fmt
    return "unknown"


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    every_n: int = 30,
    decode_backend: str = "fake",
) -> DataFrame:
    """Video frame sampling (1 row in -> N frame rows out). Stubbed the
    same way: the ``fake`` backend emits a deterministic frame count
    derived from the payload; a real backend would wrap pyav/ffmpeg.
    """
    pruned = df.select(path_col, content_col)

    def sample(batches):
        import hashlib

        import pandas as pd

        if decode_backend != "fake":  # pragma: no cover
            raise NotImplementedError("real video decode requires pyav/ffmpeg; use 'fake'")
        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                n_frames = 1 + hashlib.sha256(b).digest()[3] % 8
                for i in range(0, n_frames, max(every_n // 30, 1)):
                    out.append((path, i, len(b)))
            yield pd.DataFrame(out, columns=["path", "frame_idx", "n_bytes"])

    return pruned.mapInPandas(sample, "path string, frame_idx int, n_bytes long")
