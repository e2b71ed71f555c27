import gc, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators import dedup as D
from ingest_fast_spark.session import get_spark

def old_containment(df, k=3, threshold=0.9):
    sh = D.shingles_df(df, "text", "doc_id", k)
    sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    sh = sh.localCheckpoint(eager=True)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    byd = (sh.join(freq, "shingle").groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df_","shingle"))).alias("ranked"))
        .select("doc_id", F.transform("ranked", lambda x: x["shingle"]).alias("hs"), F.size("ranked").alias("sz"))
        .withColumn("prefix", F.slice("hs",1,(F.col("sz")-F.ceil(F.lit(threshold)*F.col("sz"))+1).cast("int")))
        .localCheckpoint(eager=True))
    pre = byd.select("doc_id", F.col("sz").alias("n_doc"), F.explode("prefix").alias("shingle"))
    full = byd.select(F.col("doc_id").alias("ref_id"), F.col("sz").alias("n_ref"), F.explode("hs").alias("shingle"))
    cands = (pre.join(full,"shingle")
        .filter((F.col("doc_id")!=F.col("ref_id")) & (F.col("n_ref")>=F.lit(threshold)*F.col("n_doc")))
        .select("doc_id","ref_id").dropDuplicates(["doc_id","ref_id"]))
    sa = byd.select("doc_id", F.col("hs").alias("hs_a"), F.col("sz").alias("n_doc"))
    sb = byd.select(F.col("doc_id").alias("ref_id"), F.col("hs").alias("hs_b"), F.col("sz").alias("n_ref"))
    n_common = F.size(F.array_intersect("hs_a","hs_b"))
    return (cands.join(sa,"doc_id").join(sb,"ref_id")
        .select("doc_id","ref_id",
                F.round(n_common/F.col("n_doc"),6).alias("containment"),
                F.round(n_common/(F.col("n_doc")+F.col("n_ref")-n_common),6).alias("jaccard"),
                n_common.alias("n_common"))
        .filter(F.col("containment")>=threshold))

spark = get_spark("ab-containment")
spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count()
d01 = load_table(spark, "/root/testdata/sf0.1", "documents")
d10 = load_table(spark, "/tmp/spark_graft_scaled_x10", "documents")
# parity at sf0.1
new_rows = {tuple(r) for r in D.containment_pairs(d01).collect()}
old_rows = {tuple(r) for r in old_containment(d01).collect()}
assert new_rows == old_rows, (len(new_rows), len(old_rows))
print("# parity OK:", len(new_rows), "rows")
best={}
variants = {"old01": (old_containment, d01), "new01": (D.containment_pairs, d01),
            "old10": (old_containment, d10), "new10": (D.containment_pairs, d10)}
for f,d in variants.values(): f(d).write.format("noop").mode("overwrite").save()
for _ in range(3):
    for k,(f,d) in variants.items():
        t0=time.perf_counter(); f(d).write.format("noop").mode("overwrite").save()
        best[k]=min(best.get(k,9e9), time.perf_counter()-t0); gc.collect()
print({k: round(v,2) for k,v in best.items()})
print("x10 factor old:", round(best["old10"]/best["old01"],2), "new:", round(best["new10"]/best["new01"],2))
