"""Z-order layout: the clustering claim, measured.

A min/max-pruning reader can skip a file iff the predicate misses the
file's [min, max] on the filtered column.  So the layout's quality IS
the per-file span: z-order must keep spans small on both interleaved
dimensions, linear sort only on its sort key."""

from __future__ import annotations

import pyspark.sql.functions as F

from sales_forecast_mlops_at_scale_spark.catalog import load_table
from sales_forecast_mlops_at_scale_spark.operators.layout import (
    file_span_stats,
    write_zordered,
    zvalue,
)

from .conftest import SF_DIR


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("date_rank"),
    )


def test_zvalue_orders_like_morton(spark):
    # canonical 2-bit Morton curve: (x, y) -> z visits the N-shaped quads
    rows = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    ).select("x", "y", zvalue(["x", "y"], bits=2).alias("z"))
    got = {(r.x, r.y): r.z for r in rows.collect()}
    # interleave: bit i of x at position 2i, bit i of y at position 2i+1
    for (x, y), z in got.items():
        expect = (
            (x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)
        )
        assert z == expect


def test_zvalue_clamps_overflow(spark):
    row = (
        spark.range(1)
        .select(zvalue([F.lit(1 << 40), F.lit(3)], bits=4).alias("z"))
        .first()
    )
    # first col clamps to 15 (1111), second is 3 (0011) -> interleaved 0x5F
    assert row.z == (0b01011111)


def test_zorder_spans_tight_on_both_dims(spark, tmp_path):
    o = _orders(spark)
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(o, zpath, ["o_custkey", "date_rank"], num_files=8)
    # linear baseline: same file count, sorted by o_custkey only
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    cols = ["o_custkey", "date_rank"]
    z = file_span_stats(spark, zpath, cols).toPandas()
    lin = file_span_stats(spark, lpath, cols).toPandas()

    # linear layout: sharp on the sort key, blind on the other dimension
    assert lin["span_o_custkey"].mean() < 0.25
    assert lin["span_date_rank"].mean() > 0.9
    # z-order: BOTH dimensions stay well under the blind baseline —
    # every file can be pruned by selective filters on either column
    assert z["span_o_custkey"].mean() < 0.7
    assert z["span_date_rank"].mean() < 0.7
    # the operative metric is the WORST dimension per file: a filter on
    # whichever column the layout neglects is the one that can't prune.
    # Linear sort leaves it at ~full range; z-order keeps it bounded.
    z_worst = z[["span_o_custkey", "span_date_rank"]].max(axis=1).mean()
    lin_worst = lin[["span_o_custkey", "span_date_rank"]].max(axis=1).mean()
    assert lin_worst > 0.9
    assert z_worst < 0.75
    assert z_worst < lin_worst


def test_compact_small_files(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.operators.layout import compact

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    o = _orders(spark)
    o.repartition(64).write.parquet(src)  # simulate micro-batch fragmentation
    n_src = len([f for f in spark.read.parquet(src).inputFiles()])
    assert n_src >= 32
    compact(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    out = spark.read.parquet(dst)
    assert len(out.inputFiles()) < n_src / 8
    assert out.count() == o.count()
