"""Z-order layout (operators/layout.py): interleave golden vs a pure
Python reference, and the actual file-skipping payoff measured from
parquet footers."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.operators.layout import (
    zorder_interleave_sql,
    zorder_keys,
    zorder_write,
)
from jobinsight_data_pipeline_v2_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_reference(spark):
    rows = spark.range(200).select(
        "id",
        F.expr("id * 131 % 65536").alias("a"),
        F.expr("id * 7919 % 65536").alias("b"),
    )
    got = rows.withColumn(
        "z", F.expr(zorder_interleave_sql("a", "b"))
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"]), (r["a"], r["b"])


def _file_boxes(path: str, col_a: str, col_b: str):
    """Per parquet file the (min, max) of both columns from footers —
    what a data-skipping scan planner reads INSTEAD of data."""
    boxes = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in (col_a, col_b)}
        hi = {c: None for c in (col_a, col_b)}
        for rg in range(md.num_row_groups):
            for c in (col_a, col_b):
                st = md.row_group(rg).column(names[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        boxes.append((lo[col_a], hi[col_a], lo[col_b], hi[col_b]))
    return boxes


def _mean_area(boxes, ra, rb):
    return sum(
        ((xh - xl) / ra) * ((yh - yl) / rb) for xl, xh, yl, yh in boxes
    ) / len(boxes)


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """The layout's actual contract: after zorder_write every file's
    footer bounding box is tight in BOTH cluster dimensions (mean
    normalized area far below the unsorted layout's ~1), a rectangle
    predicate intersects a small minority of files, and no row was
    lost or duplicated by the rewrite."""
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    zdir = os.path.join(str(tmp_path), "zorder")
    udir = os.path.join(str(tmp_path), "unsorted")
    zorder_write(orders, zdir, "o_custkey", "cents", n_files=8)
    orders.repartition(8).write.parquet(udir)

    stats = orders.agg(
        F.min("o_custkey"),
        F.max("o_custkey"),
        F.min("cents"),
        F.max("cents"),
    ).first()
    ra = float(stats[1] - stats[0])
    rb = float(stats[3] - stats[2])
    zb = _file_boxes(zdir, "o_custkey", "cents")
    ub = _file_boxes(udir, "o_custkey", "cents")
    assert len(zb) == 8
    z_area, u_area = _mean_area(zb, ra, rb), _mean_area(ub, ra, rb)
    assert z_area < 0.35, f"z-order boxes not tight: {z_area:.3f}"
    assert u_area > 0.7, f"unsorted baseline unexpectedly tight: {u_area:.3f}"

    # rectangle query: bottom-left quarter in both dimensions — the
    # footer-level file pruning a stats-aware reader performs
    qx = (stats[0], stats[0] + (stats[1] - stats[0]) // 4)
    qy = (stats[2], stats[2] + (stats[3] - stats[2]) // 4)

    def touched(boxes):
        return sum(
            1
            for xl, xh, yl, yh in boxes
            if not (xh < qx[0] or xl > qx[1] or yh < qy[0] or yl > qy[1])
        )

    assert touched(ub) == 8, "round-robin layout should prune nothing"
    assert touched(zb) <= 3, f"z-order pruned too little: {touched(zb)}/8"

    # the rewrite is a pure layout change: exact multiset equality
    back = spark.read.parquet(zdir)
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0


def test_compact_with_zorder_clusters_while_compacting(spark, tmp_path):
    """OPTIMIZE ZORDER BY shape: a fragmented partition compacted with
    zorder_cols comes back with fewer files, exact rows, tight
    per-file bounding boxes in BOTH cluster columns, and healthy
    partitions untouched."""
    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _partition_bytes_and_files,
        compact_partitions,
    )

    root = str(tmp_path)
    frag_day, healthy_day = "2026-05-01", "2026-05-02"
    rows = spark.range(4000).select(
        F.col("id"),
        F.expr("id * 131 % 10000").alias("x"),
        F.expr("id * 7919 % 10000").alias("y"),
    )
    rows.repartition(12).write.mode("overwrite").parquet(
        f"{root}/staging/ingest_date={frag_day}"
    )
    rows.coalesce(1).write.mode("overwrite").parquet(
        f"{root}/staging/ingest_date={healthy_day}"
    )
    _, healthy_files = _partition_bytes_and_files(
        spark, f"{root}/staging/ingest_date={healthy_day}"
    )
    report = compact_partitions(
        spark,
        root,
        "staging",
        target_file_bytes=16 * 1024,
        zorder_cols=("x", "y"),
    )
    assert set(report) == {frag_day}
    assert report[frag_day]["files_after"] < 12
    part = f"{root}/staging/ingest_date={frag_day}"
    back = spark.read.parquet(part)
    assert back.exceptAll(rows).count() == 0
    assert rows.exceptAll(back).count() == 0
    boxes = _file_boxes(part, "x", "y")
    if len(boxes) >= 2:
        area = _mean_area(boxes, 10000.0, 10000.0)
        assert area < 1.5 / len(boxes) + 0.15, (
            f"compacted files not z-clustered: {area:.3f} over "
            f"{len(boxes)} files"
        )
    _, healthy_after = _partition_bytes_and_files(
        spark, f"{root}/staging/ingest_date={healthy_day}"
    )
    assert healthy_after == healthy_files
