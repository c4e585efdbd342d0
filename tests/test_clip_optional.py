"""Conditional smoke for the real-CLIP encoder path (U1-U3's
production backend, reference generate.py:21 / search.py:51-54).

torch/clip are absent in the test sandbox, so the real path is
importorskip-gated — in an environment that has them the same tests
exercise model load, text encode, and the pandas_udf wiring; here they
skip cleanly. The guard behavior itself (NotImplementedError with
install guidance) is always asserted.
"""

import pytest

from laion_spark.functions.encoder import ClipEncoder


def test_clip_guard_raises_with_guidance_when_torch_missing():
    try:
        import clip  # type: ignore  # noqa: F401
        import torch  # type: ignore  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="torch"):
            ClipEncoder()
        return
    pytest.skip("torch+clip installed; guard not applicable")


def test_clip_encode_smoke_when_available(spark):
    pytest.importorskip("torch")
    pytest.importorskip("clip")
    enc = ClipEncoder(device="cpu")
    v = enc.encode("a photo of a cat")
    assert len(v) == ClipEncoder.DIM

    from pyspark.sql import functions as F

    from laion_spark.functions.encoder import embed_text_udf

    df = spark.createDataFrame([("a photo of a dog",)], "caption string")
    out = df.select(embed_text_udf(kind="clip")(F.col("caption")).alias("emb")).collect()
    assert len(out[0].emb) == ClipEncoder.DIM
