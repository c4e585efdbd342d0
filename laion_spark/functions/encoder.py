"""Text/image -> embedding encoders (reference UDF surface U1-U3).

The reference ships three ClickHouse ``executable`` UDFs backed by CLIP
ViT-L/14 (embed_text_function.xml:3-11, embed_text.py:6-16,
embed_image.py:13-19). Contract that survives the rebuild: 1 input row
-> exactly 1 output row, order-preserving, typed Array(Float32),
failures propagate.

Two implementations:
  - ``HashEncoder`` — deterministic sha256-based embedding
    (FIXTURES.md §3), the oracle-safe test encoder. Pure, portable,
    reproducible in any engine.
  - ``ClipEncoder`` — the production path; torch/CLIP are not in this
    container, so it is a clearly-marked stub that raises with install
    guidance. The Spark-side plumbing (pandas_udf signature, lazy
    per-executor singleton, Arrow batching) is real and is what a CLIP
    build would drop into.

Scale note (SURVEY.md §4.3): the encoder runs ONCE per query on the
driver in the common search path — the query vector enters the plan as
a folded literal, never as a per-row UDF call. The pandas_udf form
exists for bulk ETL (embedding a column of millions of texts), where
Arrow batching replaces the reference's line-per-row TSV protocol.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hash_embed(s: str, dim: int = 8) -> list[float]:
    """Deterministic text -> [-1, 1) vector (FIXTURES.md §3).

    dim <= 8 uses one sha256 block exactly as specified; larger dims
    extend with counter-suffixed blocks (sha256(s || "#i")), keeping
    the first 8 components identical to the base spec.
    """
    out: list[float] = []
    block = 0
    data = s.encode("utf-8")
    while len(out) < dim:
        h = hashlib.sha256(data if block == 0 else data + f"#{block}".encode()).digest()
        for j in range(8):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[4 * j : 4 * j + 4], "big") / 2**32
            out.append(round(v * 2 - 1, 6))
        block += 1
    return out


class HashEncoder:
    """Oracle-safe deterministic encoder (stands in for CLIP in tests)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def encode(self, text: str) -> list[float]:
        return hash_embed(text, self.dim)

    def encode_batch(self, texts: Sequence[str]) -> list[list[float]]:
        return [self.encode(t) for t in texts]


class ClipEncoder:
    """Production CLIP ViT-L/14 encoder (reference generate.py:21,
    embed_text.py:7). torch/CLIP are not installed in this
    environment — constructing this class raises with guidance; the
    interface matches HashEncoder so the engine code is already wired.
    """

    DIM = 768

    def __init__(self, model_name: str = "ViT-L/14", device: str = "cpu"):
        try:
            import clip  # type: ignore # noqa: F401
            import torch  # type: ignore # noqa: F401
        except ImportError as e:  # pragma: no cover - env without torch
            raise NotImplementedError(
                "ClipEncoder requires torch+clip (pip install torch git+https://github.com/openai/CLIP.git); "
                "use HashEncoder for deterministic testing"
            ) from e
        self._torch = torch
        self._model, self._preprocess = clip.load(model_name, device=device)
        self._device = device
        self.dim = self.DIM

    def encode(self, text: str) -> list[float]:  # pragma: no cover - env without torch
        import clip  # type: ignore

        with self._torch.no_grad():
            tok = clip.tokenize([text]).to(self._device)
            return self._model.encode_text(tok)[0].tolist()

    def encode_batch(self, texts: Sequence[str]) -> list[list[float]]:  # pragma: no cover
        return [self.encode(t) for t in texts]

    def encode_image(self, image) -> list[float]:  # pragma: no cover - env without torch
        """PIL image -> embedding (reference search.py:51-54: preprocess
        then model.encode_image). Required by embed_image_udf(kind="clip")
        and search_image."""
        with self._torch.no_grad():
            batch = self._preprocess(image).unsqueeze(0).to(self._device)
            return self._model.encode_image(batch)[0].tolist()


# --- pandas_udf surface (bulk path; Arrow batches replace TSV pipes) --------

_ENCODER_SINGLETON: dict[tuple[str, int], object] = {}


def _get_encoder(kind: str, dim: int):
    """Lazy per-worker singleton — the pandas_udf closure must not
    capture a heavyweight model; it is constructed once per executor
    process (mirrors the reference's executable_pool warm processes,
    embed_concept_function.xml:3-12)."""
    key = (kind, dim)
    if key not in _ENCODER_SINGLETON:
        _ENCODER_SINGLETON[key] = ClipEncoder() if kind == "clip" else HashEncoder(dim)
    return _ENCODER_SINGLETON[key]


def embed_text_udf(kind: str = "hash", dim: int = 8):
    """``embedText(String) -> Array(Float32)`` as a vectorized
    pandas_udf (U1). One row in -> one row out, order preserved within
    each Arrow batch by construction."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        enc = _get_encoder(kind, dim)
        return texts.map(lambda s: None if s is None else enc.encode(s))

    return _embed


def embed_concept_udf(kind: str = "hash", dim: int = 8):
    """``embedConcept(String) -> Array(Float32)`` (U3): parse + evaluate
    a concept-math expression per row (embed_concept.py:62-66)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(exprs: pd.Series) -> pd.Series:
        from laion_spark.plans.concept import eval_concept

        enc = _get_encoder(kind, dim)
        return exprs.map(lambda s: None if s is None else [float(x) for x in eval_concept(s, enc)])

    return _embed


def embed_image_udf(kind: str = "hash", dim: int = 8, timeout_s: float = 5.0):
    """``embedImage(String) -> Array(Float32)`` (U2): URL in, image
    embedding out (embed_image.py:13-19 fetches, decodes, encodes; HTTP
    failures propagate via raise_for_status — same here).

    ``kind="hash"`` (default in this environment) deterministically
    encodes the URL string — real CLIP weights and network access are
    not oracle material. ``kind="clip"`` fetches and encodes for real.

    100 TB note (SURVEY.md §2.5 U2): network fetch inside a query UDF is
    the throughput ceiling — production pipelines should run a dedicated
    fetch stage (bounded retry/timeout budget, checkpointed to a binary
    column) and encode from bytes, not fetch inline per query.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(urls: pd.Series) -> pd.Series:
        if kind == "hash":
            enc = _get_encoder("hash", dim)
            return urls.map(lambda u: None if u is None else enc.encode(u))

        import io  # pragma: no cover - env without torch/requests/PIL

        import requests
        from PIL import Image

        enc = _get_encoder("clip", dim)

        def one(u):
            if u is None:
                return None
            r = requests.get(u, timeout=timeout_s)
            r.raise_for_status()  # failures propagate (embed_image.py:15)
            return enc.encode_image(Image.open(io.BytesIO(r.content)))

        return urls.map(one)

    return _embed


def register_udfs(spark, kind: str = "hash", dim: int = 8) -> None:
    """Expose the UDF surface to SQL users:
    ``SELECT embed_text(caption) FROM t``."""
    from laion_spark.session import _ship_package

    _ship_package(spark)  # UDF closures unpickle by module reference
    spark.udf.register("embed_text", embed_text_udf(kind, dim))
    spark.udf.register("embed_image", embed_image_udf(kind, dim))
    spark.udf.register("embed_concept", embed_concept_udf(kind, dim))
