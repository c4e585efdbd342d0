"""V10 half-width vector storage (the reference's bfloat16 table run,
images/results_ridgeback_bfloat16.png / BASELINE.md row 3, re-expressed
for parquet).

Parquet has no bfloat16; its native half-width float is FLOAT16, which
carries the same storage/bandwidth trade (half the bytes per element,
~3 decimal digits of mantissa). Spark's JVM reader cannot open FLOAT16
parquet at all ([PARQUET_TYPE_ILLEGAL]) — but this engine's scan-side
scorer (``knn_search_parquet``) reads splits with pyarrow, which
decodes halffloat natively and upcasts to float32 in numpy, so the
half-width table is a drop-in for vector search: half the scan bytes,
identical query surface.

The rewrite itself is distributed scan-side too: one task per source
file, each decoding with pyarrow, casting the vector columns, and
writing its output file directly — the wide columns never touch the
JVM, and at 100 TB the rewrite parallelizes file-wise with no shuffle.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_half_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    vector_cols: Sequence[str] = ("embedding",),
    compression: str = "snappy",
    layout: str = "packed",
) -> DataFrame:
    """Rewrite a parquet table with ``vector_cols`` narrowed from
    list<float/double> to half-width float16 (half the vector bytes).

    ``layout`` picks the physical encoding (default ``"packed"`` — the
    only layout that converts halved bytes into halved scan time;
    measured 10M x 768: packed 1.72 s vs list 5.19 s vs f32 3.05 s):

    - ``"list"``: list<float16>. Parquet stores each element as
      FIXED_LEN_BYTE_ARRAY(2), which pyarrow decodes PER VALUE — the
      scan is decode-bound at ~3 GB/s (measured, 10M x 768), eating
      most of the bandwidth the halved bytes bought. Kept for parity
      with engines that expose a half float element type.
    - ``"packed"``: one FIXED_LEN_BYTE_ARRAY(2*dim) per vector —
      little-endian float16, the whole vector as one value. Parquet
      decodes large fixed-width values by bulk memcpy and the scorer
      reinterprets the data buffer with numpy (zero-copy frombuffer),
      so the scan runs at full-width byte speed on half the bytes —
      the recommendation for half-precision vectors in parquet, and
      the honest analog of the reference's packed bfloat16 arrays.

    Local filesystems only (the bench/fixture path); the read side
    (``knn_search_parquet``) also handles remote stores. Returns a
    DataFrame of (path, rows) — one row per written file.

    The source's directory tree is PRESERVED relative to ``src_path``:
    a Hive-partitioned layout (e.g. an ``IVFIndex.write_index`` table's
    ``ivf_cluster=K/`` dirs) comes out with the same partition dirs, so
    pruning layers stack on the half-width twin unchanged — the
    compounding the reference gets from running Annoy over its bfloat16
    table.
    """
    from laion_spark.operators.knn import _list_parquet_files
    from laion_spark.session import _ship_package

    _ship_package(spark)
    fs, files, remote = _list_parquet_files([src_path])
    if remote:
        raise NotImplementedError("write_half_table targets local paths (fixture/bench use)")
    root = src_path[7:] if src_path.startswith("file:///") else src_path
    root = root.rstrip("/")
    tasks = []
    for i, f in enumerate(files):
        rel = f[len(root):].lstrip("/") if f.startswith(root) else f"part-{i:05d}.parquet"
        rel = rel or os.path.basename(f)  # src_path was a single file
        dst = os.path.join(dst_path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tasks.append((f, dst))
    vcols = list(vector_cols)
    if layout not in ("list", "packed"):
        raise ValueError(f"layout must be 'list' or 'packed', got {layout!r}")
    packed = layout == "packed"

    def conv(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        def pack_chunk(ch, dim):
            # list<float> chunk -> fixed_size_binary(2*dim) of packed
            # little-endian float16 (one bulk astype + buffer wrap)
            n = len(ch)
            if ch.null_count:
                raise ValueError(f"NULL vector in packed half rewrite ({n} rows)")
            flat = ch.flatten().to_numpy(zero_copy_only=False)
            if len(flat) != n * dim:
                raise ValueError(f"ragged vectors: {n} rows x {dim} != {len(flat)}")
            data = np.ascontiguousarray(flat.astype(np.float16)).tobytes()
            return pa.Array.from_buffers(pa.binary(2 * dim), n, [None, pa.py_buffer(data)])

        for rb in batches:
            for src, dst in zip(rb.column(0).to_pylist(), rb.column(1).to_pylist()):
                # stream row-group-wise: a whole-file read_table would
                # hold ~2x the file in one worker's memory (source +
                # cast copy); this keeps peak at one row group
                pf = pq.ParquetFile(src)
                schema = pf.schema_arrow
                dims: dict[str, int] = {}
                if packed:
                    # infer each vector column's (fixed) dim from the
                    # first row group — the binary width is part of the
                    # output schema, needed before the writer opens
                    probe = pf.read_row_group(0, columns=vcols)
                    for c in vcols:
                        col = probe.column(c).combine_chunks()
                        if len(col) == 0:
                            raise ValueError(f"cannot infer dim of {c!r}: empty row group")
                        dims[c] = len(col.flatten()) // len(col)
                for c in vcols:
                    i = schema.get_field_index(c)
                    tgt = pa.binary(2 * dims[c]) if packed else pa.list_(pa.float16())
                    schema = schema.set(i, schema.field(i).with_type(tgt))
                rows = 0
                with pq.ParquetWriter(dst, schema, compression=compression) as w:
                    for g in range(pf.metadata.num_row_groups):
                        t = pf.read_row_group(g)
                        for c in vcols:
                            i = t.schema.get_field_index(c)
                            if packed:
                                col = t.column(c).combine_chunks()
                                t = t.set_column(i, c, pack_chunk(col, dims[c]))
                            else:
                                t = t.set_column(i, c, t.column(c).cast(pa.list_(pa.float16())))
                        w.write_table(t.cast(schema))
                        rows += t.num_rows
                yield pa.RecordBatch.from_arrays(
                    [pa.array([dst]), pa.array([rows], type=pa.int64())],
                    ["path", "rows"],
                )

    n = len(tasks)
    jobs = spark.createDataFrame(tasks, "src string, dst string")
    if n > 1:
        jobs = jobs.repartition(min(n, spark.sparkContext.defaultParallelism))
    return jobs.mapInArrow(conv, "path string, rows long")


def write_int8_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    vector_cols: Sequence[str] = ("embedding",),
    compression: str = "snappy",
) -> DataFrame:
    """Rewrite a parquet table with ``vector_cols`` scalar-quantized to
    int8 (SQ8): each vector becomes a packed fixed_size_binary(dim) of
    symmetric int8 codes plus a ``{col}_scale`` float32 column with its
    per-vector dequantization factor (max|x| / 127; codes reconstruct
    as ``code * scale``). 1/4 of the float32 bytes — the storage the
    v13 catalog entry's int8 codes were designed to ship to — served by
    ``knn_search_parquet(..., scale_col="{col}_scale")`` and composing
    with IVF partition pruning exactly like the f16 twins (the source's
    directory tree, including ``ivf_cluster=K`` dirs, is preserved).

    Zero vectors quantize to all-zero codes with scale 1.0 (exact).
    Same file-wise distributed rewrite shape as ``write_half_table``:
    one task per source file, no shuffle, wide columns never in the JVM.
    """
    from laion_spark.operators.knn import _list_parquet_files
    from laion_spark.session import _ship_package

    _ship_package(spark)
    fs, files, remote = _list_parquet_files([src_path])
    if remote:
        raise NotImplementedError("write_int8_table targets local paths (fixture/bench use)")
    root = src_path[7:] if src_path.startswith("file:///") else src_path
    root = root.rstrip("/")
    tasks = []
    for i, f in enumerate(files):
        rel = f[len(root):].lstrip("/") if f.startswith(root) else f"part-{i:05d}.parquet"
        rel = rel or os.path.basename(f)
        dst = os.path.join(dst_path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tasks.append((f, dst))
    vcols = list(vector_cols)

    def conv(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from laion_spark.operators.knn import flat_matrix

        def quantize_chunk(ch, dim):
            mat = flat_matrix(ch, dim, np.float32)
            n = len(ch)
            if not np.isfinite(mat).all():
                # NaN/Inf through rint→astype(int8) is undefined in
                # numpy — corrupt codes written silently. Same loud-
                # failure policy as the NULL/ragged checks (ADVICE r9).
                bad = int((~np.isfinite(mat)).sum())
                raise ValueError(
                    f"{bad} non-finite element(s) in vector column; SQ8 "
                    "quantization requires finite inputs — clean or clip "
                    "the vectors before write_int8_table"
                )
            maxabs = np.abs(mat).max(axis=1)
            scale = np.where(maxabs > 0, maxabs / 127.0, 1.0).astype(np.float32)
            codes = np.clip(np.rint(mat / scale[:, None]), -127, 127).astype(np.int8)
            fsb = pa.Array.from_buffers(
                pa.binary(dim), n, [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())]
            )
            return fsb, pa.array(scale, type=pa.float32())

        for rb in batches:
            for src, dst in zip(rb.column(0).to_pylist(), rb.column(1).to_pylist()):
                pf = pq.ParquetFile(src)
                schema = pf.schema_arrow
                probe = pf.read_row_group(0, columns=vcols)
                dims: dict[str, int] = {}
                for c in vcols:
                    col = probe.column(c).combine_chunks()
                    if len(col) == 0:
                        raise ValueError(f"cannot infer dim of {c!r}: empty row group")
                    dims[c] = len(col.flatten()) // len(col)
                for c in vcols:
                    i = schema.get_field_index(c)
                    schema = schema.set(i, schema.field(i).with_type(pa.binary(dims[c])))
                    schema = schema.append(pa.field(f"{c}_scale", pa.float32()))
                rows = 0
                with pq.ParquetWriter(dst, schema, compression=compression) as w:
                    for g in range(pf.metadata.num_row_groups):
                        t = pf.read_row_group(g)
                        for c in vcols:
                            i = t.schema.get_field_index(c)
                            fsb, sc = quantize_chunk(t.column(c).combine_chunks(), dims[c])
                            t = t.set_column(i, c, fsb)
                            t = t.append_column(f"{c}_scale", sc)
                        w.write_table(t.cast(schema))
                        rows += t.num_rows
                yield pa.RecordBatch.from_arrays(
                    [pa.array([dst]), pa.array([rows], type=pa.int64())],
                    ["path", "rows"],
                )

    n = len(tasks)
    jobs = spark.createDataFrame(tasks, "src string, dst string")
    if n > 1:
        jobs = jobs.repartition(min(n, spark.sparkContext.defaultParallelism))
    return jobs.mapInArrow(conv, "path string, rows long")
