"""Capture .explain("formatted") for named queries into plans/<tag>/.

Writes plans/<tag>/<query>_<suffix>.txt for each query — the optimization
rounds' before/after plan evidence (the judge checks plan claims against
these files). Mutating/streaming queries run their fixtures first exactly
like bench.py, so the captured plan is the one the bench times.

Usage: python scripts/save_plans.py <tag> <suffix> [sf_dir] query [...]
e.g.:  python scripts/save_plans.py r11 before /root/testdata/sf0.001 \
           matview_minmax_maintenance secondary_index_lookup
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_on_hbase_spark.session import size_driver_heap_for_launch  # noqa: E402

size_driver_heap_for_launch()


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.001"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]

    from spark_on_hbase_spark.inventory import QUERIES, WARMERS
    from spark_on_hbase_spark.session import get_spark

    spark = get_spark("save_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in WARMERS.values():
        warm(spark, sf_dir)

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in rest:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
