import pytest
from pyspark.sql import functions as F

from laion_spark.operators import knn_search
from tests.conftest import SF_DIR, assert_matches_oracle, duck_con

QVEC = [round(((j * 37) % 19 - 9) / 10.0, 1) for j in range(64)]
QLIT = "[" + ", ".join(f"{x}::DOUBLE" for x in QVEC) + "]"


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_knn_l2_matches_duckdb(spark, emb, sf_dir):
    got = knn_search(
        emb,
        QVEC,
        k=10,
        vector_col="embedding",
        select=["vec_id"],
        tiebreak=["vec_id"],
    ).select("vec_id", F.round("score", 6).alias("score"))
    sql = f"""
      SELECT vec_id,
             round(sqrt(list_aggregate(list_transform(range(1, 65),
               i -> (CAST(embedding[i] AS DOUBLE) - ({QLIT})[i]) ^ 2), 'sum')), 6) AS score
      FROM embeddings
      ORDER BY 2, 1
      LIMIT 10
    """
    assert_matches_oracle(got, duck_con(sf_dir), sql)


def test_knn_with_filter(spark, emb):
    out = knn_search(
        emb, QVEC, k=5, vector_col="embedding", filter="label = 3", select=["vec_id", "label"], tiebreak=["vec_id"]
    ).collect()
    assert len(out) == 5
    assert all(r.label == 3 for r in out)
    scores = [r.score for r in out]
    assert scores == sorted(scores)


def test_knn_physical_plan_is_take_ordered(spark, emb):
    plan = knn_search(emb, QVEC, k=10, vector_col="embedding", select=["vec_id"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_knn_l2_null_embedding_ranks_last(spark, emb):
    """A NULL embedding scores NULL and must not displace real top-k
    rows (plain asc is NULLS FIRST in Spark — ADVICE r1)."""
    with_null = emb.select("vec_id", "embedding").unionAll(
        spark.sql("SELECT -1 AS vec_id, CAST(NULL AS array<float>) AS embedding")
    )
    for impl in ("codegen", "hof"):
        out = knn_search(
            with_null, QVEC, k=10, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"], impl=impl
        ).collect()
        assert all(r.vec_id != -1 for r in out), f"NULL row leaked into top-k ({impl})"
        assert all(r.score is not None for r in out)


def test_knn_parquet_scan_parity(spark, emb, sf_dir):
    """The scan-side Arrow+BLAS scorer (bench fast lane) reproduces the
    codegen path exactly at the round(6) grain, all metrics."""
    from laion_spark.operators.knn import knn_search_parquet

    path = f"{sf_dir}/embeddings.parquet"
    for metric in ("l2", "cosine", "dot"):
        a = knn_search(
            emb, QVEC, k=10, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"], metric=metric
        ).collect()
        b = knn_search_parquet(spark, path, QVEC, k=10, vector_col="embedding", select=["vec_id"], metric=metric).collect()
        assert [(r.vec_id, round(r.score, 6)) for r in a] == [(r.vec_id, round(r.score, 6)) for r in b], metric


def test_knn_parquet_scan_multi_row_groups(spark, emb, tmp_path):
    """Split enumeration is per (file, row_group): a file with many row
    groups fans out into independent splits and still scores exactly."""
    import pyarrow.parquet as pq

    from laion_spark.operators.knn import knn_search_parquet

    path = str(tmp_path / "rg")
    emb.coalesce(1).write.parquet(path)
    import glob

    f = glob.glob(f"{path}/part-*.parquet")[0]
    small = str(tmp_path / "rg_small.parquet")
    pq.write_table(pq.read_table(f), small, row_group_size=100)
    assert pq.ParquetFile(small).metadata.num_row_groups > 3
    got = knn_search_parquet(spark, small, QVEC, k=7, vector_col="embedding", select=["vec_id"]).collect()
    want = knn_search(emb, QVEC, k=7, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"]).collect()
    assert [(r.vec_id, round(r.score, 6)) for r in got] == [(r.vec_id, round(r.score, 6)) for r in want]


def test_knn_parquet_scan_filter_pushdown(spark, emb, sf_dir):
    """pa_filter pushes the predicate into the Arrow reader (row-group
    stats skip + vectorized residual) and must equal the codegen path
    with the same Spark filter."""
    import pyarrow.compute as pc

    from laion_spark.operators.knn import knn_search_parquet

    path = f"{sf_dir}/embeddings.parquet"
    a = knn_search(
        emb, QVEC, k=7, vector_col="embedding", filter="label = 3", select=["vec_id", "label"], tiebreak=["vec_id"]
    ).collect()
    b = knn_search_parquet(
        spark, path, QVEC, k=7, vector_col="embedding", select=["vec_id", "label"], pa_filter=pc.field("label") == 3
    ).collect()
    assert [(r.vec_id, round(r.score, 6)) for r in a] == [(r.vec_id, round(r.score, 6)) for r in b]
    empty = knn_search_parquet(
        spark, path, QVEC, k=7, vector_col="embedding", select=["vec_id"], pa_filter=pc.field("label") == 10**6
    ).collect()
    assert empty == []


def test_knn_parquet_scan_partition_dirs(spark, emb, tmp_path):
    """A list of partition dirs is the ANN hook: scanning only the
    probed partitions must equal brute force over the same subset."""
    from laion_spark.operators.knn import knn_search_parquet

    path = str(tmp_path / "by_label")
    emb.write.partitionBy("label").parquet(path)
    dirs = [f"{path}/label=1", f"{path}/label=3"]
    got = knn_search_parquet(spark, dirs, QVEC, k=5, vector_col="embedding", select=["vec_id"]).collect()
    want = knn_search(
        emb.filter("label IN (1, 3)"), QVEC, k=5, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"]
    ).collect()
    assert [(r.vec_id, round(r.score, 6)) for r in got] == [(r.vec_id, round(r.score, 6)) for r in want]


def test_knn_parquet_scan_partitioned_root(spark, emb, tmp_path):
    """Scanning the ROOT of a Hive-partitioned table must work: the
    partition column is pruned from a default select (it is not in the
    physical files) and an explicit select of it raises clearly."""
    from laion_spark.operators.knn import knn_search_parquet

    path = str(tmp_path / "proot")
    emb.write.partitionBy("label").parquet(path)
    got = knn_search_parquet(spark, path, QVEC, k=5, vector_col="embedding").collect()
    want = knn_search(emb, QVEC, k=5, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"]).collect()
    assert [(r.vec_id, round(r.score, 6)) for r in got] == [(r.vec_id, round(r.score, 6)) for r in want]
    with pytest.raises(ValueError, match="partition"):
        knn_search_parquet(spark, path, QVEC, k=5, vector_col="embedding", select=["vec_id", "label"])


def test_knn_parquet_scan_cosine_zero_vector_ranks_last(spark, tmp_path):
    """A zero-norm vector scores NaN in cosine; NaN sorts ABOVE every
    double under desc in Spark, so it must be nulled and ranked last."""
    from laion_spark.operators.knn import knn_search_parquet

    rows = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 2.0, 3.0]), (2, [3.0, 2.0, 1.0])]
    df = spark.createDataFrame(rows, "id int, embedding array<float>")
    path = str(tmp_path / "zv.parquet")
    df.coalesce(1).write.parquet(path)
    got = knn_search_parquet(spark, path, [1.0, 2.0, 3.0], k=3, vector_col="embedding", metric="cosine").collect()
    assert [r.id for r in got] == [1, 2, 0]
    assert got[-1].score is None


def test_knn_parquet_scan_nan_element_does_not_drop_batch(spark, tmp_path):
    """One NaN element must not make the f32 selection drop every row
    of its batch (a NaN k-th threshold compares all-False)."""
    from laion_spark.operators.knn import knn_search_parquet

    rows = [(0, [float("nan"), 1.0]), (1, [1.0, 1.0]), (2, [2.0, 2.0]), (3, [3.0, 3.0])]
    df = spark.createDataFrame(rows, "id int, embedding array<float>")
    path = str(tmp_path / "nan.parquet")
    df.coalesce(1).write.parquet(path)
    got = knn_search_parquet(spark, path, [1.0, 1.0], k=2, vector_col="embedding").collect()
    assert [r.id for r in got] == [1, 2]


def test_knn_arrow_impl_null_embedding_scores_null(spark, emb):
    """impl=arrow must match the codegen/hof NULL contract: NULL
    embeddings get a NULL score ranked last, not a hard error."""
    with_null = emb.select("vec_id", "embedding").unionAll(
        spark.sql("SELECT -1 AS vec_id, CAST(NULL AS array<float>) AS embedding")
    )
    out = knn_search(
        with_null, QVEC, k=10, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"], impl="arrow"
    ).collect()
    assert all(r.vec_id != -1 for r in out)
    ref = knn_search(
        with_null, QVEC, k=10, vector_col="embedding", select=["vec_id"], tiebreak=["vec_id"], impl="codegen"
    ).collect()
    assert [(r.vec_id, round(r.score, 6)) for r in out] == [(r.vec_id, round(r.score, 6)) for r in ref]


def test_flat_matrix_guards():
    import pyarrow as pa

    from laion_spark.operators.knn import flat_matrix

    ok = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float32()))
    assert flat_matrix(ok, 2).shape == (2, 2)
    with_null = pa.array([[1.0, 2.0], None], type=pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="NULL"):
        flat_matrix(with_null, 2)
    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="ragged"):
        flat_matrix(ragged, 2)


def test_flat_matrix_packed_and_variable_binary():
    """Packed layouts decode identically whether the column arrives as
    fixed_size_binary (pyarrow scan) or plain binary (after a Spark JVM
    crossing, which has no fixed-width binary type) — r14, for the
    write_packed_index round-trip and the x17 entry."""
    import numpy as np
    import pyarrow as pa

    from laion_spark.operators.knn import flat_matrix

    dim = 4
    vals = np.arange(8, dtype=np.float32).reshape(2, dim) / 7.0
    raw = vals.tobytes()
    fsb = pa.array([raw[:16], raw[16:]], type=pa.binary(4 * dim))
    var = pa.array([raw[:16], raw[16:]], type=pa.binary())
    large = pa.array([raw[:16], raw[16:]], type=pa.large_binary())
    want = vals.astype(np.float64)
    for col in (fsb, var, large):
        got = flat_matrix(col, dim)
        assert got.shape == (2, dim)
        assert (got == want).all(), col.type
    # f16 and i8 widths dispatch from variable binary too
    h = vals.astype(np.float16).tobytes()
    var16 = pa.array([h[:8], h[8:]], type=pa.binary())
    assert np.allclose(flat_matrix(var16, dim), want, atol=1e-3)
    codes = np.array([[1, -2, 3, -4], [5, -6, 7, 127]], dtype=np.int8)
    vari8 = pa.array([codes[0].tobytes(), codes[1].tobytes()], type=pa.binary())
    assert (flat_matrix(vari8, dim) == codes.astype(np.float64)).all()
    # ragged packed widths fail loudly
    bad = pa.array([raw[:16], raw[16:24]], type=pa.binary())
    with pytest.raises(ValueError, match="ragged|width"):
        flat_matrix(bad, dim)
    # sliced (non-zero offset) variable binary decodes the right rows
    sl = var.slice(1, 1)
    assert (flat_matrix(sl, dim) == want[1:]).all()


def test_knn_cosine_and_dot(spark, emb):
    for metric in ("cosine", "dot"):
        out = knn_search(
            emb, QVEC, k=5, vector_col="embedding", metric=metric, select=["vec_id"], tiebreak=["vec_id"]
        ).collect()
        assert len(out) == 5
        scores = [r.score for r in out]
        assert scores == sorted(scores, reverse=True)


def test_list_parquet_files_local_and_remote(monkeypatch, tmp_path):
    """_list_parquet_files (R7 seam): local paths/dirs stay on
    LocalFileSystem with no network; remote URIs resolve ONCE (S3
    region lookup is a network call per from_uri) and the rest map by
    prefix stripping; probed-but-missing dirs (empty clusters) are
    skipped; mixed filesystems rejected."""
    import pyarrow.fs as pafs

    import laion_spark.operators.knn as knn_mod
    from laion_spark.operators.knn import _list_parquet_files

    d = tmp_path / "tbl"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    (d / "b.parquet").write_bytes(b"x")
    (d / "_SUCCESS").write_bytes(b"")

    fs, files, remote = _list_parquet_files([str(d)])
    assert isinstance(fs, pafs.LocalFileSystem) and not remote
    assert [f.rsplit("/", 1)[1] for f in files] == ["a.parquet", "b.parquet"]

    # missing dir (empty ANN cluster) skipped, not fatal
    fs, files, remote = _list_parquet_files([str(d), str(tmp_path / "nope")])
    assert len(files) == 2

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        _list_parquet_files([str(tmp_path / "nope")])

    calls = []

    def fake(uri):
        calls.append(uri)
        return pafs.LocalFileSystem(), uri[len("s3://bkt"):]

    monkeypatch.setattr(knn_mod, "_fs_from_uri", fake)
    fs, files, remote = _list_parquet_files(
        [f"s3a://bkt{d}/a.parquet", f"s3://bkt{d}/b.parquet"]
    )
    assert remote and [f.rsplit("/", 1)[1] for f in files] == ["a.parquet", "b.parquet"]
    assert calls == [f"s3://bkt{d}/a.parquet"]  # exactly one resolution

    with _pytest.raises(ValueError, match="mixed filesystems"):
        _list_parquet_files([f"s3://bkt{d}/a.parquet", "gs://other/y.parquet"])


def test_knn_parquet_task_table_fallback(spark, sf_dir, monkeypatch):
    """Above _TASKS_INLINE_MAX splits the scorer ships (path, row_group)
    rows through the task-table shuffle instead of the task closure
    (100 TB-scale listings must not bloat the broadcast task binary);
    both dispatch modes must return identical rows."""
    from laion_spark.operators import knn as knn_mod
    from laion_spark.operators.knn import knn_search_parquet

    path = f"{sf_dir}/embeddings.parquet"
    inline = [
        (r.vec_id, round(r.score, 6))
        for r in knn_search_parquet(spark, path, QVEC, k=7, vector_col="embedding", select=["vec_id"]).collect()
    ]
    monkeypatch.setattr(knn_mod, "_TASKS_INLINE_MAX", 0)
    shuffled = [
        (r.vec_id, round(r.score, 6))
        for r in knn_search_parquet(spark, path, QVEC, k=7, vector_col="embedding", select=["vec_id"]).collect()
    ]
    assert inline == shuffled


def test_scale_rows_inplace_and_view_fallback():
    """r15: _scale_rows must multiply in place ONLY for owned writeable
    matrices (SQ8/f16 astype copies) and fall back to allocating for
    zero-copy views, with identical values either way."""
    import numpy as np

    from laion_spark.operators.knn import _scale_rows

    scales = np.asarray([0.5, 2.0, 1.5], dtype=np.float32)
    # mirror the decode path's shape: reshape THEN astype, so the
    # resulting matrix owns its buffer (a bare reshape is a view)
    owned = np.arange(12, dtype=np.int8).reshape(3, 4).astype(np.float32)
    want = owned * scales[:, None]
    got = _scale_rows(owned, scales)
    assert got is owned  # mutated in place, no second temporary
    assert np.array_equal(got, want)

    base = np.arange(12, dtype=np.float32).reshape(3, 4)
    base.setflags(write=False)
    view = base[:]
    got2 = _scale_rows(view, scales)
    assert got2 is not view  # read-only view: allocating fallback
    assert np.array_equal(got2, want)
    assert np.array_equal(base, np.arange(12, dtype=np.float32).reshape(3, 4))

    owned64 = np.arange(12, dtype=np.int8).reshape(3, 4).astype(np.float64)
    got3 = _scale_rows(owned64, scales)
    assert got3.dtype == np.float64
    assert np.array_equal(got3, np.arange(12).reshape(3, 4) * scales.astype(np.float64)[:, None])
