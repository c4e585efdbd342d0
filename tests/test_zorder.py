"""Z-order clustered layout: multi-dimensional footer skipping.

The claim under test: ONE z-ordered layout prunes files for
single-column box predicates on EITHER clustered column, where a
single-column sort layout only ever prunes on its own sort key.
"""
import pyspark.sql.functions as F
import pytest

from laion_spark.sources.zorder import write_zordered, zorder_pruned_scan


@pytest.fixture(scope="module")
def grid(spark):
    return spark.range(40_000).select(
        F.col("id"),
        (F.col("id") % 200).alias("x"),
        ((F.col("id") / 200).cast("long") % 200).alias("y"),
    )


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    write_zordered(grid, [("x", 0, 199), ("y", 0, 199)], zpath, files=16)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    # y-only box: the x-sorted layout cannot skip anything; the
    # z-layout must skip files because each file covers a narrow
    # y-band too
    df_z, st_z = zorder_pruned_scan(spark, zpath, {"y": (20, 40)})
    df_x, st_x = zorder_pruned_scan(spark, xpath, {"y": (20, 40)})
    assert st_x["files_scanned"] == st_x["files_total"], st_x
    assert st_z["files_scanned"] < st_z["files_total"], st_z

    # x-only box: both layouts skip
    _, st_zx = zorder_pruned_scan(spark, zpath, {"x": (20, 40)})
    _, st_xx = zorder_pruned_scan(spark, xpath, {"x": (20, 40)})
    assert st_zx["files_scanned"] < st_zx["files_total"], st_zx
    assert st_xx["files_scanned"] < st_xx["files_total"], st_xx

    # 2-dim box: conjunction prunes at least as hard as either dim
    _, st_box = zorder_pruned_scan(spark, zpath, {"x": (20, 40), "y": (20, 40)})
    assert st_box["files_scanned"] <= min(
        st_z["files_scanned"], st_zx["files_scanned"]
    ), st_box

    # pruning is never a correctness input
    expect = grid.filter(F.col("y").between(20, 40)).count()
    assert df_z.count() == expect
    assert df_x.count() == expect


def test_zorder_scan_exact_on_2d_box(spark, grid, tmp_path):
    zpath = str(tmp_path / "zorder2")
    write_zordered(grid, [("x", 0, 199), ("y", 0, 199)], zpath, files=8)
    df, _ = zorder_pruned_scan(spark, zpath, {"x": (50, 120), "y": (0, 60)})
    expect = grid.filter(
        F.col("x").between(50, 120) & F.col("y").between(0, 60)
    )
    assert df.count() == expect.count()
    assert (
        df.agg(F.sum("id")).collect()[0][0]
        == expect.agg(F.sum("id")).collect()[0][0]
    )
