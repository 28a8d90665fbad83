"""Z-order layout tests: the clustering must measurably tighten
parquet row-group min/max spans on BOTH dimensions (that's the whole
point — multi-dimensional data skipping), verified from the actual
file footers via pyarrow."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.layout import (
    zorder_by,
    zorder_value,
)


def _avg_span_fraction(path: str, col: str) -> float:
    """Mean (max-min) row-group span for ``col``, as a fraction of the
    file-wide span. 1.0 = no skipping possible; small = tight stats."""
    import glob

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    lo_all = min(s[0] for s in spans)
    hi_all = max(s[1] for s in spans)
    width = hi_all - lo_all or 1
    return sum((b - a) for a, b in spans) / len(spans) / width


def test_zorder_value_is_narrow_expression(spark):
    """No Python UDF, no extra shuffle in the z-value itself."""
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    z = df.withColumn("z", zorder_value(df, ["a", "b"]))
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_zorder_interleave_locality(spark):
    """Points close in (a, b) space must be close in z — check the
    curve orders the unit grid like a Morton curve (prefix property:
    the four quadrants occupy four contiguous z ranges)."""
    df = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a int, b int"
    )
    rows = (
        df.withColumn("z", zorder_value(df, ["a", "b"]))
        .orderBy("z")
        .collect()
    )
    quadrant = [2 * (r.a >= 8) + (r.b >= 8) for r in rows]
    # each quadrant's rows are contiguous in z order
    changes = sum(
        1 for i in range(1, len(quadrant)) if quadrant[i] != quadrant[i - 1]
    )
    assert changes == 3, f"quadrants interleaved {changes} times in z order"


def test_zorder_write_tightens_both_dims(spark, tmp_path):
    """vs a single-column sort: z-order keeps BOTH columns' row-group
    spans far below 100%; a linear sort leaves the second column's
    spans ~full-width."""
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 997).cast("double").alias("x"),
        ((F.col("id") * 131) % 983).cast("double").alias("y"),
    )
    linear_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear_path)
    )
    zorder_by(df, ["x", "y"], num_partitions=8).write.mode(
        "overwrite"
    ).parquet(z_path)

    lin_x = _avg_span_fraction(linear_path, "x")
    lin_y = _avg_span_fraction(linear_path, "y")
    z_x = _avg_span_fraction(z_path, "x")
    z_y = _avg_span_fraction(z_path, "y")
    # linear sort: x tight, y useless
    assert lin_x < 0.35 and lin_y > 0.9
    # z-order: both dimensions skippable, and y must beat linear by a lot
    assert z_x < 0.75 and z_y < 0.75
    assert z_y < lin_y / 2


def test_zorder_nan_does_not_collapse_buckets(spark):
    """A NaN in one dimension must not push every value into the top
    bucket (NaN would otherwise be max())."""
    df = spark.createDataFrame(
        [(1.0, 1.0), (3.0, 5.0), (2.0, float("nan"))], "a double, b double"
    )
    rows = df.withColumn("z", zorder_value(df, ["a", "b"])).collect()
    zs = {(r.a if r.a == r.a else None): r.z for r in rows}
    assert zs[1.0] != zs[3.0], "distinct (a,b) points collapsed to one z"


def test_zorder_three_dims(spark):
    """3-column interleave: still a narrow expression, and the first
    octant (all three coords low) occupies a contiguous z prefix."""
    df = spark.createDataFrame(
        [
            (a, b, c)
            for a in range(8)
            for b in range(8)
            for c in range(8)
        ],
        "a int, b int, c int",
    )
    rows = (
        df.withColumn("z", zorder_value(df, ["a", "b", "c"]))
        .orderBy("z")
        .collect()
    )
    octant = [
        4 * (r.a >= 4) + 2 * (r.b >= 4) + (r.c >= 4) for r in rows
    ]
    changes = sum(
        1 for i in range(1, len(octant)) if octant[i] != octant[i - 1]
    )
    assert changes == 7, f"octants interleaved {changes} times in z order"
