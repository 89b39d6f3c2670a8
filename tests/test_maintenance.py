"""Small-file compaction: row preservation, file-count plan, clustering."""

import os

import pytest
from pyspark.sql import functions as F

from hotdog_spark.operators import maintenance as m


def _parquet_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


@pytest.fixture()
def small_files(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(0, 20000).select(
        F.col("id"),
        (F.col("id") % 97).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(40).write.parquet(src)  # 40 tiny files
    return src


def test_plan_compaction_pure():
    assert m.plan_compaction(0, 128) == 1
    assert m.plan_compaction(1, 128) == 1
    assert m.plan_compaction(129, 128) == 2
    assert m.plan_compaction(128 * 10, 128) == 10
    with pytest.raises(ValueError):
        m.plan_compaction(100, 0)


def test_compact_preserves_rows_and_hits_plan(spark, tmp_path, small_files):
    dst = str(tmp_path / "dst")
    _, total = m.dir_parquet_stats(small_files)
    target = max(1, total // 4)  # aim for ~4-5 files
    report = m.compact_parquet(spark, small_files, dst, target_file_bytes=target)
    assert report["input_files"] == 40
    assert report["rows"] == 20000
    got_files = _parquet_files(dst)
    assert len(got_files) == report["planned_output_files"] <= 6
    # exact multiset round-trip
    a = sorted(tuple(r) for r in spark.read.parquet(small_files).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_cluster_by_gives_pruneable_ranges(spark, tmp_path, small_files):
    dst = str(tmp_path / "dstc")
    _, total = m.dir_parquet_stats(small_files)
    m.compact_parquet(
        spark, small_files, dst, target_file_bytes=max(1, total // 4),
        cluster_by=["id"],
    )
    # range-clustered output: per-file id ranges must not overlap
    ranges = []
    for f in _parquet_files(dst):
        r = spark.read.parquet(f).agg(F.min("id"), F.max("id")).first()
        if r[0] is not None:
            ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    a = sorted(tuple(r) for r in spark.read.parquet(small_files).collect())
    assert a == b
