"""Data model: the wide columnar fact table of the reference.

The reference declares its schema exactly once, as a PyArrow Parquet
schema (/root/reference/process.py:35-47). This module is the Spark
equivalent — explicit StructType, never inferred. Embeddings are
stored as ``array<float>`` (the reference's UDF contract returns
Array(Float32), embed_text_function.xml:5); math is done in double.
The reference's bfloat16 table variant maps to the FLOAT16 parquet
twin in ``sources/halfvec.py`` (V10) — half the scan bytes, readable
by the Arrow scan path.

Spark has no fixed-length array type, so dimensionality (768 in the
reference, process.py:59) is enforced by a runtime check at ingest
(``validate_embeddings``), not by the type system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Reference embedding dimensionality (CLIP ViT-L/14 — process.py:59,66).
EMBEDDING_DIM = 768

#: The laion fact table (process.py:35-47). Column ``nsfw`` is
#: lowercase engine-side (the reference spells it ``NSFW``; lowercase
#: avoids case-sensitivity drift against external engines).
LAION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("similarity", T.DoubleType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("original_width", T.LongType(), True),
        T.StructField("original_height", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("nsfw", T.StringType(), True),
        T.StructField("exif", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("text_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("image_embedding", T.ArrayType(T.FloatType()), True),
    ]
)

#: Driver testdata tables (TESTDATA.md) — names only; schemas live in
#: the parquet footers and are read as-is.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet, schema from footer)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def validate_embeddings(df: DataFrame, cols: tuple[str, ...] = ("text_embedding", "image_embedding"), dim: int = EMBEDDING_DIM) -> DataFrame:
    """Ingest-time dimensionality check (fails the job on bad rows).

    Spark-idiomatic CHECK constraint: raise_error inside a projection,
    which stays in whole-stage codegen and costs one branch per row.
    """
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(
                c,
                F.when(F.col(c).isNull() | (F.size(c) == dim), F.col(c)).otherwise(
                    F.raise_error(F.concat(F.lit(f"bad {c} dim: "), F.size(c).cast("string")))
                ),
            )
    return out
