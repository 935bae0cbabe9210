"""Dump .explain("formatted") for registry queries to plan files.

The optimization rounds' evidence contract: the judge cannot run Spark,
so every plan claim in OPTIMIZATION_r{N}.md must be backed by a
committed ``plans/r{N}/<query>_<tag>.txt`` file. This tool writes them.

Usage:
    python tools/explain_dump.py --tag before [--out plans/r13] \
        [--sf-dir /root/testdata/sf0.1] [query ...]

With no query names: dumps every bench HEADLINE query. The plan string
is the pre-execution formatted plan (AdaptiveSparkPlan isFinalPlan=false
where AQE applies) — the same thing ``df.explain("formatted")`` prints.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="suffix: before|after|...")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    import bench
    from tidb_binlog_spark.cache import release_all
    from tidb_binlog_spark.session import get_spark

    spark = get_spark("explain_dump")
    qs = entry.queries()
    names = args.queries or bench.HEADLINE
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            text = explain_str(df)
        except Exception as e:  # keep going; record the failure
            text = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        release_all()
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
