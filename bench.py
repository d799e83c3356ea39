#!/usr/bin/env python
"""Headline benchmark: run every benchmarkable registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Timing excludes driver-side result transfer: each query is executed
with the noop sink so the full plan (scan → shuffle → agg/window)
runs, mirroring cluster-side cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from transit_data_pipeline_spark.operators.registry import all_specs
    from transit_data_pipeline_spark.session import get_spark

    spark = get_spark("transit-spark-bench")

    specs = {n: s for n, s in all_specs().items() if s.bench}
    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch JIT.
    specs["perf_ranking_trends"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        # Best of 2: the first run of a query can pay one-off JIT /
        # codegen-compile / GC costs that move between queries run to
        # run; the minimum reflects the plan's steady-state cost.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
