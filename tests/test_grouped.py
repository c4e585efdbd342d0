"""U4 grouped custom aggregation: applyInPandas centroid vs its
algebraic (partial-aggregating) twin and vs the DuckDB oracle."""

from laion_spark.operators.grouped import (
    centroid_grouped_agg,
    centroids_algebraic,
    centroids_exploded,
    grouped_centroid,
)


def test_centroid_impls_agree(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = grouped_centroid(emb, "label", "embedding").collect()
    b = centroids_algebraic(emb, "label", "embedding").collect()
    c = centroid_grouped_agg(emb, "label", "embedding").collect()
    assert [(r.label, r.n, r.centroid) for r in a] == [(r.label, r.n, r.centroid) for r in b]
    assert [(r.label, r.n, r.centroid) for r in a] == [(r.label, r.n, r.centroid) for r in c]
    assert len(a) > 1
    assert all(len(r.centroid) == 64 for r in a)


def test_centroid_exploded_matches_applyinpandas(spark, sf_dir):
    """The catalog's scalar (label, n, pos, value) surface must carry
    exactly the applyInPandas centroid's values — same quantization,
    same rounding."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    arrays = {r.label: (r.n, r.centroid) for r in grouped_centroid(emb, "label", "embedding").collect()}
    flat = centroids_exploded(emb, "label", "embedding").collect()
    assert len(flat) == sum(len(c) for _n, c in arrays.values())
    for r in flat:
        n, cent = arrays[r.label]
        assert r.n == n and r.value == cent[r.pos]


def test_centroid_partitioning_invariant(spark, sf_dir):
    """Exact int64 accumulation: any repartitioning gives identical bits."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = grouped_centroid(emb, "label", "embedding").collect()
    b = grouped_centroid(emb.repartition(13, "vec_id"), "label", "embedding").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
