"""Dump .explain('formatted') for a set of queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry
    from vyperdatum_spark.session import get_spark

    spark = get_spark(app_name="dump-plans",
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  # final plans without AQE wrappers so
                                  # Exchange/codegen spans are readable
                                  "spark.sql.adaptive.enabled": "false"})
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = entry.queries_extended()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
