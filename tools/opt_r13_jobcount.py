"""Round-13: deterministic jobs-per-warm-run counter (statusTracker) for named queries."""
import sys, time
sys.path.insert(0, "/root/repo")
from etl_example_spark.plans.registry import load_all
from etl_example_spark.session import get_spark
from etl_example_spark.sources.loaders import warm_tables

spark = get_spark(app_name="job_count", shuffle_partitions=8)
sc = spark.sparkContext
warm_tables(spark, "/root/testdata/sf0.1", partitions=8)
qs = load_all()
names = sys.argv[1:]
out = {}
for name in names:
    q = qs[name]
    # one warmup (stage caches etc.)
    df = q.spark_builder(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    st = sc.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    n0 = len(before)
    df = q.spark_builder(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    after = set(st.getJobIdsForGroup(None) or [])
    out[name] = len(after) - n0
import json
print(json.dumps(out))
