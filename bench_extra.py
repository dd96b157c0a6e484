"""Extra benchmarks for the optimization round (bench.py is frozen).

Per-query phase breakdown at $SPARK_GRAFT_SF_DIR:
    python bench_extra.py phases <query> [query ...]
prints, for each query and pass: build (Python construction of the
DataFrame, incl. any eager sub-jobs), analyze (df.schema — Catalyst
analysis), exec (noop materialization).

    python bench_extra.py time <query> [query ...]
bench.py-identical timing (2 passes, min) for a subset, quiet.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from vyperdatum_spark.session import get_spark

    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-extra",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries_extended()
    # same warm-up as bench.py
    _materialize(qs["geo_transform_mllw"](spark, sf_dir))

    if mode == "phases":
        for name in names:
            for p in (1, 2):
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                t1 = time.perf_counter()
                _ = df.schema
                t2 = time.perf_counter()
                _materialize(df)
                t3 = time.perf_counter()
                print(json.dumps({
                    "query": name, "pass": p,
                    "build": round(t1 - t0, 3),
                    "analyze": round(t2 - t1, 3),
                    "exec": round(t3 - t2, 3),
                    "total": round(t3 - t0, 3),
                }))
    elif mode == "time":
        timings = {}
        for _ in range(2):
            for name in names:
                t0 = time.perf_counter()
                _materialize(qs[name](spark, sf_dir))
                sec = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, sec), sec)
        print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
