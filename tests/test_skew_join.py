"""AQE skew-join handling: a constructed hot key must be SPLIT by adaptive
execution (the runtime mitigation our session enables), and the result
must be identical to the non-adaptive join."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # 200k rows of one hot key + uniform tail, joined against a small-but-
    # not-broadcast right side. Thresholds are lowered so local data
    # qualifies as "skewed" (production keeps the defaults).
    left = spark.range(0, 220_000).select(
        F.when(F.col("id") < 200_000, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, "k")
        # Execute THIS DataFrame's QueryExecution (count()/write would spawn
        # a fresh one and the adaptive plan would never finalize here).
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        # correctness unchanged by the split
        assert n == 200_000 * 1 + 20_000
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
