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


def test_packed_rewrite_roundtrip(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/embeddings.parquet"
    dst = str(tmp_path / "emb_f16p")
    res = write_half_table(
        spark, src, dst, vector_cols=("embedding",), layout="packed"
    ).collect()
    n_src = spark.read.parquet(src).count()
    assert sum(r.rows for r in res) == n_src
    # packed is fixed_size_binary(2*dim): same halved bytes as list<f16>
    sz = lambda files: sum(os.path.getsize(f) for f in files)
    src_b = sz(glob.glob(src) or glob.glob(src + "/*.parquet"))
    dst_b = sz(glob.glob(dst + "/*.parquet"))
    assert dst_b < 0.7 * src_b, (src_b, dst_b)
    # the physical type really is one fixed-width value per vector
    import glob as _g

    import pyarrow.parquet as pq

    f0 = sorted(_g.glob(dst + "/*.parquet"))[0]
    t = pq.read_table(f0)
    import pyarrow as pa

    assert pa.types.is_fixed_size_binary(t.schema.field("embedding").type)
    assert t.schema.field("embedding").type.byte_width == 2 * 64


def test_packed_table_knn_matches_full_precision(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/embeddings.parquet"
    dst = str(tmp_path / "emb_f16p_knn")
    write_half_table(spark, src, dst, vector_cols=("embedding",), layout="packed").collect()
    full = knn_search_parquet(spark, src, QVEC64, k=10, vector_col="embedding", select=["vec_id"])
    packed = knn_search_parquet(spark, dst, QVEC64, k=10, vector_col="embedding", select=["vec_id"])
    full_ids = [r.vec_id for r in full.collect()]
    packed_ids = [r.vec_id for r in packed.collect()]
    assert len(set(full_ids) & set(packed_ids)) >= 9, (full_ids, packed_ids)


def test_packed_matches_list_f16_exactly(spark, sf_dir, tmp_path):
    # same float16 values either way -> identical scores, identical ids
    src = f"{sf_dir}/embeddings.parquet"
    d_list = str(tmp_path / "emb_l")
    d_pack = str(tmp_path / "emb_p")
    write_half_table(spark, src, d_list, vector_cols=("embedding",)).collect()
    write_half_table(spark, src, d_pack, vector_cols=("embedding",), layout="packed").collect()
    a = knn_search_parquet(spark, d_list, QVEC64, k=10, vector_col="embedding", select=["vec_id"])
    b = knn_search_parquet(spark, d_pack, QVEC64, k=10, vector_col="embedding", select=["vec_id"])
    assert [r.vec_id for r in a.collect()] == [r.vec_id for r in b.collect()]
