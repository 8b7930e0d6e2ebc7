"""Write-path proof for the Z-order layout: files persisted under
repartitionByRange(zkey) + sortWithinPartitions(zkey) must carry parquet
min/max statistics tight enough to prune range predicates on BOTH
dimensions — the property the layout exists for. (Plain-parquet Spark
prunes at the row-group level inside each file; table formats prune the
file list from the same min/max stats, so footer-intersection count IS
the files-read count a stats-aware scan pays.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _files_touched(path, x_rng, y_rng):
    """Count files whose footer [min,max] box intersects the query box —
    exactly the files a min/max-pruning scan must read."""
    from pathlib import Path

    import pyarrow.parquet as pq

    touched, total = 0, 0
    for f in Path(path).glob("*.parquet"):
        md = pq.read_metadata(f)
        mins = {c: None for c in ("x", "y")}
        maxs = {c: None for c in ("x", "y")}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        total += 1
        if (
            mins["x"] <= x_rng[1]
            and maxs["x"] >= x_rng[0]
            and mins["y"] <= y_rng[1]
            and maxs["y"] >= y_rng[0]
        ):
            touched += 1
    return touched, total


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """A 256x256 grid written in Z-order across 16 files: a 16x16 query
    box (1/256 of the plane) must touch a small minority of files on
    BOTH dimensions. The same data sorted by x alone answers x-range
    queries but every y-range predicate touches ALL files — the
    single-dimension baseline Z-order exists to beat."""
    from salesforce_prefect_etl_pipeline_spark.operators.layout import zorder_key

    n, bits, n_files = 256, 8, 16
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .withColumn("zkey", zorder_key(F.col("x"), F.col("y"), bits=bits))
    )
    zpath, xpath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    (
        grid.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    (
        grid.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    box = ((96, 111), (160, 175))  # 16x16 box away from the edges
    z_touched, z_total = _files_touched(zpath, *box)
    assert z_total >= n_files
    # Z-order: the box covers 1/256 of the curve; generous bound of 1/4
    # of the files still proves two-dimensional locality
    assert z_touched <= z_total // 4, (z_touched, z_total)

    # y-only predicate: x-sorted layout cannot prune (every file spans
    # all y), Z-order still can
    y_only = ((0, n - 1), (160, 175))
    x_touched, x_total = _files_touched(xpath, *y_only)
    zy_touched, _ = _files_touched(zpath, *y_only)
    assert x_touched == x_total, "x-sorted layout must fail to prune on y"
    assert zy_touched < z_total, "z-order must prune even y-only ranges"

    # and the readback through Spark with the two-dim predicate is exact
    got = (
        spark.read.parquet(zpath)
        .filter(
            F.col("x").between(*box[0]) & F.col("y").between(*box[1])
        )
        .count()
    )
    assert got == 16 * 16


def test_zorder_key_rejects_out_of_range_coordinates(spark):
    """A coordinate >= 2^bits would alias distant rows onto the same
    curve position (silently breaking min/max pruning); the key must
    raise instead of truncating."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from salesforce_prefect_etl_pipeline_spark.operators.layout import zorder_key

    df = spark.range(1).select(
        F.lit(1 << 16).alias("x"), F.lit(0).alias("y")
    )
    with pytest.raises(SparkRuntimeException, match="zorder_key"):
        df.select(zorder_key(F.col("x"), F.col("y"), bits=16)).collect()
    # bits widened -> same coordinate is legal again
    ok = df.select(zorder_key(F.col("x"), F.col("y"), bits=17).alias("z")).collect()
    assert ok[0].z >= 0
    # negative coordinates are equally out of range
    neg = spark.range(1).select(F.lit(-1).alias("x"), F.lit(0).alias("y"))
    with pytest.raises(SparkRuntimeException, match="zorder_key"):
        neg.select(zorder_key(F.col("x"), F.col("y"))).collect()
