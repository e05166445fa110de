"""Same-session interleaved A/B: full-rewrite vs bucket-pruned upsert
materialization (VERDICT r10 perf watch-item → code, r11).

Scenario — the key-range-local CDC shape the bucketed sink is for:
batch 0 loads an N-key state table; batches 1..3 each update a
contiguous 1% key range (recent/hot ids). The full-rewrite sink MERGES
and rewrites all N rows every batch (the 6.2×/decade term in the sf10
stateful curve); the bucketed sink with range clustering
(bucket_expr = id div width, 64 buckets) rewrites only the 1-2 buckets
the hot range lands in.

Run on an otherwise-idle box:

    python scripts/bucketed_upsert_ab_r11.py [N]

Prints per-variant total stream wall, per-batch triggerExecution from
recentProgress, and cross-checks the two final states (count + content
hash) for equality.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from stream_processing_project_spark.streaming.sinks import (
    read_bucketed_state,
    upsert_materialized_view,
    upsert_materialized_view_bucketed,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N_BUCKETS = 64
HOT = N // 100  # 1% contiguous range per incremental batch

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.shuffle.partitions", "32")
    .appName("bucketed-upsert-ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

src = tempfile.mkdtemp(prefix="upsert_ab_src_")
# wide rows: real CDC state carries a record payload — a slim 4-column
# state understates the rewrite cost the bucketing exists to avoid
SCHEMA = "id long, user_id long, payload string, __op string, __ts_ms long"

# batch 0: full load of N keys; batches 1..3: contiguous 1% hot ranges
# every batch is exactly 8 files so maxFilesPerTrigger=8 makes each
# trigger one logical batch (file-source ordering is by mtime; the dirs
# are written sequentially, seconds apart)
spark.range(N).select(
    F.col("id"),
    F.col("id").alias("user_id"),
    F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string")),
             F.lit("-" + "x" * 64)).alias("payload"),
    F.lit("c").alias("__op"),
    F.lit(1000).cast("long").alias("__ts_ms"),
).coalesce(8).write.mode("overwrite").parquet(f"{src}/b0")
for i in range(1, 4):
    lo = (i - 1) * HOT
    spark.range(lo, lo + HOT).select(
        F.col("id"),
        (F.col("id") + 1).alias("user_id"),
        F.concat(F.lit("payload-"), F.md5((F.col("id") + i).cast("string")),
                 F.lit("-" + "y" * 64)).alias("payload"),
        F.lit("u").alias("__op"),
        F.lit(1000 + 1000 * i).cast("long").alias("__ts_ms"),
    ).coalesce(8).write.mode("overwrite").parquet(f"{src}/b{i}")
    time.sleep(1.2)


def stream():
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .option("latestFirst", "false")
        .parquet(f"{src}/b*")
    )


def batch_durations(q):
    return [
        (p.batchId, (p.durationMs or {}).get("triggerExecution"))
        for p in q.recentProgress
        if p.numInputRows > 0
    ]


def run_full():
    state = tempfile.mkdtemp(prefix="upsert_ab_full_")
    t0 = time.time()
    q, versions = upsert_materialized_view(stream(), state)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wall = time.time() - t0
    final = spark.read.parquet(versions[-1])
    return wall, batch_durations(q), final, state


def run_bucketed():
    state = tempfile.mkdtemp(prefix="upsert_ab_bkt_")
    width = (N + N_BUCKETS - 1) // N_BUCKETS
    t0 = time.time()
    q, snaps = upsert_materialized_view_bucketed(
        stream(),
        state,
        n_buckets=N_BUCKETS,
        bucket_expr=(F.col("id") / F.lit(width)).cast("int"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wall = time.time() - t0
    final = read_bucketed_state(spark, snaps[-1])
    return wall, batch_durations(q), final, state


def content_hash(df):
    cols = ["id", "user_id", "payload", "__op", "__ts_ms"]
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).first()
    return row["n"], row["h"]


print(f"N={N:,} keys, {N_BUCKETS} range buckets, hot range {HOT:,}/batch")
results = {"full": [], "bucketed": []}
hashes = {}
dirs = []
for rep in range(REPS):  # interleaved so box drift hits both variants
    for name, fn in (("full", run_full), ("bucketed", run_bucketed)):
        wall, per_batch, final, state = fn()
        dirs.append(state)
        results[name].append(wall)
        hashes[name] = content_hash(final)
        pb = ", ".join(f"b{b}={ms}ms" for b, ms in per_batch)
        print(f"  rep{rep} {name:9s} wall={wall:7.2f}s  [{pb}]")

print("final-state hash:", hashes)
assert hashes["full"] == hashes["bucketed"], "state divergence!"
f, b = min(results["full"]), min(results["bucketed"])
print(f"best-of walls: full={f:.2f}s bucketed={b:.2f}s ratio={f/b:.2f}x")
for d in dirs + [src]:
    shutil.rmtree(d, ignore_errors=True)
