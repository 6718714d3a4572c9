"""Adaptive parallelism for compute-dense operators.

Problem: a small parquet file arrives as ONE input split, so everything
upstream of the first shuffle runs on one core — invisible at 100 TB
(thousands of splits), catastrophic locally and on small dimension-sized
inputs feeding CPU-heavy expressions (per-shingle hashing, O(n²) vector
distance).

``spread`` repartitions ONLY when the scan produced fewer partitions than
the session's parallelism. On a real 100 TB read the input-split count
already exceeds the cluster's cores and this is a no-op — we never pay an
unnecessary full-corpus shuffle at scale, while small inputs fan out to
every core. Hash-partitioning by the given keys keeps downstream
key-joins/aggregations co-partitioned where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Fan ``df`` out to the session's default parallelism iff it is
    under-partitioned (see module docstring). ``cols``: optional hash keys;
    without them rows round-robin."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if cols:
        return df.repartition(target, *cols)
    return df.repartition(target)
