"""Per-query profiler: construction vs execution split, job/stage breakdown.

Usage: python tools/profile_query.py q137_meser_streaming_staging [more...]

For each named registry query, reports:
- construct_s: time to build the DataFrame (planning + any eager pins /
  scratch writes / streaming replays that run at construction time)
- exec_s: time for the noop write of the returned frame (the bench's timed
  action re-runs construction too; this split shows where the seconds live)
- second-rep times (warm JIT) for both, matching the bench's min-of-reps
- per-job wall times from a SparkListener-free proxy: the status tracker's
  job/stage counts before and after.

Writes nothing; prints one line per query. Keep the host quiet.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from srm_etl_spark.operators.session_cache import release_all
    from srm_etl_spark.plans import REGISTRY
    from srm_etl_spark.session import get_spark

    spark = get_spark("srm-etl-profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    sc = spark.sparkContext

    tracker = sc.statusTracker()

    for name in names:
        qd = REGISTRY[name]
        # bench semantics: release BETWEEN queries, reps share warm pools —
        # rep2 is the steady-state number the bench's min-of-reps reports
        release_all(spark)
        for rep in (1, 2):
            # job counts are the noise-immune metric on a stolen-CPU host:
            # a warm rep that re-runs as many jobs as the cold rep got zero
            # cache reuse, whatever the wall clock says
            group = f"prof_{name}_r{rep}"
            sc.setJobGroup(group, f"{name} rep{rep}")
            t0 = time.monotonic()
            df = qd.spark(spark, sf_dir)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            n_jobs = len(tracker.getJobIdsForGroup(group))
            print(
                f"{name} rep{rep}: construct={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
                f"total={t2 - t0:.3f}s jobs={n_jobs}",
                flush=True,
            )
        sc._jsc.clearJobGroup()


if __name__ == "__main__":
    main()
