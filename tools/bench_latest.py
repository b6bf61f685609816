"""One-off: benchmark latest_per_key variants at sf0.1 (min-of-3 warm)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from srm_etl_spark.session import get_spark

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bench-latest")
ev = spark.read.parquet(f"{sf}/events.parquet")
ev.count()  # warm the scan cache

KEYS, TS, TB = ["user_id"], "ts", ["event_id"]


def v_window(df):
    order = [F.col(TS).desc()] + [F.col(t).asc() for t in TB]
    w = Window.partitionBy(*KEYS).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def v_structmax(df):
    row = F.struct(*[F.col(c) for c in df.columns]).alias("_row")
    keeper = F.max(F.struct(F.col(TS), *[F.col(t) for t in TB], row)).alias("_keep")
    return df.groupBy(*KEYS).agg(keeper).select("_keep._row.*")


def v_aggjoin(df):
    # shuffle only (key, ts, tiebreak); join winners back for the full row
    neg = (-F.col(TS).cast("timestamp").cast("double")).alias("_negts")
    win = (
        df.select(*KEYS, neg, *[F.col(t) for t in TB])
        .groupBy(*KEYS)
        .agg(F.min(F.struct(F.col("_negts"), *[F.col(t) for t in TB])).alias("_k"))
        .select(*KEYS, F.col("_k._negts").alias("_negts"), *[F.col(f"_k.{t}").alias(t) for t in TB])
    )
    cond = [df[k] == win[k] for k in KEYS] + [(-df[TS].cast("timestamp").cast("double")) == win["_negts"]] + [
        df[t] == win[t] for t in TB
    ]
    return df.join(win, cond, "left_semi")


for name, fn in [("window", v_window), ("structmax", v_structmax), ("aggjoin", v_aggjoin)]:
    times = []
    for _ in range(3):
        t0 = time.time()
        n = fn(ev).count()
        times.append(time.time() - t0)
    print(f"{name}: min={min(times):.3f}s reps={[f'{t:.3f}' for t in times]} rows={n}")
