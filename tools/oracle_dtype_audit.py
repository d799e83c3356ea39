"""One-off audit: sweep every registered query for driver-dtype traps
before the driver finds them (VERDICT r6 ask #5).

Runs each query's Spark output and DuckDB oracle at sf0.001 and
applies ONLY the driver-strict structural checks from
``tests/compare._strict_problems``:

* non-scalar output cells (list/ndarray/struct) on either side — the
  driver's canonicalizer crashes on these (r06: higher_order_lambda_suite);
* per-column dtype-family mismatches (int vs float vs decimal vs
  date/datetime/str/bool) — the driver hashes ``719`` and ``719.0``
  differently (r06: tpch_q12 via DuckDB's un-cast SUM(CASE…) HUGEINT).

Values are NOT compared here (tests/test_oracle_parity.py owns that);
this is the cheap structural pre-flight. Exit code 1 if any finding.

Usage:  python tools/oracle_dtype_audit.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*", help="subset of query names (default: all)")
    args = ap.parse_args()

    from compare import _strict_problems, duck_con
    from transit_data_pipeline_spark.operators.registry import all_specs
    from transit_data_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("oracle-dtype-audit")
    con = duck_con(args.sf_dir)

    specs = all_specs()
    names = args.names or sorted(specs)
    findings: dict[str, list[str]] = {}
    t0 = time.time()
    for i, name in enumerate(names, 1):
        spec = specs[name]
        if spec.oracle is None:
            continue
        try:
            sp = spec.fn(spark, args.sf_dir).toPandas()
            du = con.execute(spec.oracle).df()
        except Exception:
            findings[name] = ["EXECUTION ERROR:\n" + traceback.format_exc(limit=3)]
            continue
        probs = _strict_problems(sp, du)
        if probs:
            findings[name] = probs
        if i % 50 == 0:
            print(f"... {i}/{len(names)} audited ({time.time()-t0:.0f}s)", flush=True)

    print(f"\naudited {len(names)} queries in {time.time()-t0:.0f}s")
    if findings:
        print(f"{len(findings)} queries with driver-dtype findings:\n")
        for name, probs in sorted(findings.items()):
            print(f"== {name}")
            for p in probs:
                print(f"   {p}")
        return 1
    print("no findings — all oracle outputs are scalar and dtype-aligned")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
