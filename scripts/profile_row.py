"""Profile a single catalog row in isolation with the noop sink.

Usage: python scripts/profile_row.py <query> [repeats]

Runs the named query (warm + timed, the bench protocol) and prints the
wall; with PROFILE_JOBS=1, also dumps per-job wall times from a
SparkListener so the expensive action inside a composite row is
identifiable (guide §1.1/§1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udacity_capstone_data_engineering_spark import get_spark
from udacity_capstone_data_engineering_spark import queries as catalog


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # warm
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    profile_jobs = os.environ.get("PROFILE_JOBS") == "1"
    if profile_jobs:
        # Poll the status tracker around the timed run: cheap, no
        # listener plumbing, and the job ids are contiguous — after the
        # run, pull each job's description + wall from the AppStatusStore
        # via the REST-less JVM status API.
        tracker = spark.sparkContext.statusTracker()
        before_ids = set(tracker.getJobIdsForGroup(None) or [])
    for r in range(repeats):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{name} run{r}: {time.perf_counter() - t0:.3f}s", flush=True)
    if profile_jobs:
        store = spark.sparkContext._jsc.sc().statusStore()
        it = store.jobsList(None).iterator()
        rows = []
        while it.hasNext():
            j = it.next()
            jid = j.jobId()
            if jid in before_ids:
                continue
            sub = j.submissionTime()
            comp = j.completionTime()
            if sub.isEmpty() or comp.isEmpty():
                continue
            wall = (
                comp.get().getTime() - sub.get().getTime()
            ) / 1000.0
            desc = j.description()
            rows.append((jid, wall, desc.get() if desc.isDefined() else j.name()))
        rows.sort()
        for jid, wall, desc in rows:
            print(f"  job {jid:4d}  {wall:8.3f}s  {str(desc)[:140]}", flush=True)
        print(
            f"  jobs total: {sum(w for _, w, _ in rows):.3f}s over "
            f"{len(rows)} jobs",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
