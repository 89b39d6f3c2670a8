"""DataFrame→DataFrame operators beyond the reference surface: the
LLM-data-pipeline toolkit (dedup, similarity search, text analysis,
multimodal plumbing), each designed partition-parallel for 100 TB scale."""

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure a compute-heavy input is spread across the cluster's cores.

    A small parquet file arrives as one partition (maxPartitionBytes), so
    a hash-heavy pipeline (md5 per shingle, dot product per pair) would
    run single-task no matter how many cores exist — measured 7× slowdown
    on a 5k-doc input.  At 100 TB inputs are naturally multi-partition and
    this is a no-op; on compact inputs one cheap round-robin shuffle buys
    full parallelism for the expensive downstream work.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
