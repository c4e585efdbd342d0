"""V10 half-width storage: the float16 rewrite halves vector bytes and
the scan-side scorer returns the same neighbors (at float16's ~1e-3
grain the fixture's top-k ordering is stable)."""

import glob
import os

from laion_spark.operators.knn import knn_search_parquet
from laion_spark.sources.halfvec import write_half_table

QVEC64 = [round(((j * 37) % 19 - 9) / 10.0, 1) for j in range(64)]


def test_half_rewrite_roundtrip(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/embeddings.parquet"
    dst = str(tmp_path / "emb_f16")
    res = write_half_table(spark, src, dst, vector_cols=("embedding",)).collect()
    n_src = spark.read.parquet(src).count()
    assert sum(r.rows for r in res) == n_src
    # bytes roughly halve (random floats don't compress, so the vector
    # column dominates both files)
    sz = lambda files: sum(os.path.getsize(f) for f in files)
    src_b = sz(glob.glob(src) or glob.glob(src + "/*.parquet"))
    dst_b = sz(glob.glob(dst + "/*.parquet"))
    assert dst_b < 0.7 * src_b, (src_b, dst_b)


def test_half_table_knn_matches_full_precision(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/embeddings.parquet"
    dst = str(tmp_path / "emb_f16_knn")
    write_half_table(spark, src, dst, vector_cols=("embedding",)).collect()
    full = knn_search_parquet(spark, src, QVEC64, k=10, vector_col="embedding", select=["vec_id"])
    half = knn_search_parquet(spark, dst, QVEC64, k=10, vector_col="embedding", select=["vec_id"])
    full_ids = [r.vec_id for r in full.collect()]
    half_ids = [r.vec_id for r in half.collect()]
    # float16 rounding can swap near-ties at the tail; demand >= 9/10 agreement
    assert len(set(full_ids) & set(half_ids)) >= 9, (full_ids, half_ids)
