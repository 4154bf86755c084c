"""Time individual registry queries in isolation (bench.py methodology:
noop sink, median-of-N wall clock + /proc JVM-CPU per query) — the
per-change measurement loop of the optimization rounds.

Usage: SPARK_GRAFT_QTIME_PASSES=5 python tools/qtime.py [sf_dir] query [query ...]
Prints one line per query: name wall_median cpu_median wall_samples.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import _jvm_pid, _proc_cpu_sec

    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.plans import QUERIES

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    passes = int(os.environ.get("SPARK_GRAFT_QTIME_PASSES", "5"))

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM + listing + Arrow worker pool
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    jvm_pid = _jvm_pid(spark)
    for name in args:
        walls, cpus = [], []
        for _ in range(passes):
            c0 = _proc_cpu_sec(jvm_pid)
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
            cpus.append(round(_proc_cpu_sec(jvm_pid) - c0, 3))

        def med(xs: list[float]) -> float:
            s = sorted(xs)
            n = len(s)
            return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3)

        print(
            f"{name:36s} wall={med(walls):7.3f}  cpu={med(cpus):7.3f}  "
            f"samples={walls}"
        )


if __name__ == "__main__":
    main()
