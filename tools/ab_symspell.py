import gc, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from ingest_fast_spark.catalog import load_table, ensure_parallelism
from ingest_fast_spark.session import get_spark
from ingest_fast_spark.queries.llm import _DEL1
spark = get_spark("ab-symspell")
spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count()
SF="/root/testdata/sf0.1"

def pairs(broadcast_side):
    c = load_table(spark, SF, "customer").select("c_custkey","c_name")
    c = ensure_parallelism(c, work_amplification=20)
    var_expr = f"array_union({_DEL1.format(c='c_name')}, array(c_name))"
    variants = c.select(F.col("c_custkey").alias("k"), F.col("c_name").alias("nm"),
                        F.explode(F.expr(var_expr)).alias("v"))
    a, b = variants.alias("a"), variants.alias("b")
    bb = F.broadcast(b) if broadcast_side else b
    cand = a.join(bb, (F.col("a.v")==F.col("b.v")) & (F.col("a.k")<F.col("b.k"))).select(
        F.col("a.k").alias("key_a"), F.col("a.nm").alias("name_a"),
        F.col("b.k").alias("key_b"), F.col("b.nm").alias("name_b"))
    dist = F.expr("levenshtein(name_a, name_b, 1)")
    return cand.select("key_a","key_b",dist.alias("dist")).filter((F.col("dist")>=0)&(F.col("dist")<=1)).distinct()

# parity
n_new = pairs(True).count(); n_old = pairs(False).count()
assert n_new == n_old, (n_new, n_old)
print("# pair count", n_new)
best={}
for f,name in ((lambda: pairs(False), "shuffle_join"), (lambda: pairs(True), "broadcast_join")):
    f().write.format("noop").mode("overwrite").save()
for _ in range(3):
    for name, bc in (("shuffle",False),("broadcast",True)):
        t0=time.perf_counter(); pairs(bc).write.format("noop").mode("overwrite").save()
        best[name]=min(best.get(name,9e9), time.perf_counter()-t0); gc.collect()
print(best)
# variants frame size estimate
c = load_table(spark, SF, "customer").select("c_custkey","c_name")
var = c.select(F.col("c_custkey").alias("k"), F.col("c_name").alias("nm"), F.explode(F.expr(f"array_union({_DEL1.format(c='c_name')}, array(c_name))")).alias("v"))
print("variants stats bytes:", var._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
print("variants rows:", var.count())
