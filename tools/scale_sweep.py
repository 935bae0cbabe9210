"""Registry-wide 100x quadratic hunt: run EVERY registry query at a
scaled directory (default .scale/sf10 = 100x sf0.1) and at sf0.1,
report the time ratio. A linear operator shows ratio <= ~100 (minus
amortized overheads); anything approaching the row-growth squared is
a hidden all-pairs stage. Since r9 make_scaled_sf.scale_tpch also
replicates the TPC-H facts (lineitem/orders in disjoint o_orderkey
bands, dims copied verbatim), so the snapshot family is swept too —
ALL 216 registry queries run; a query is skipped only if its input
parquet is genuinely absent from the scaled dir.

Usage: python tools/scale_sweep.py [BASE_DIR SCALED_DIR]
           [--flag N] [--only q1,q2,...] [--skip-first N]
Prints one JSON line {query: {base_sec, scaled_sec, ratio}} plus a
flagged list (ratio > N, default 60 = exponent ~0.9 at 100x).
--only restricts to named queries (spot re-checks after a fix);
--skip-first skips the first N registry positions (resume a sweep
that already covered them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tidb_binlog_spark.cache import release_all
from tidb_binlog_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base = args[0] if args else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scaled = args[1] if len(args) > 1 else os.path.join(
        repo, ".scale", "sf10")
    flag_ratio = 60.0
    only: list[str] | None = None
    skip_first = 0
    for a in sys.argv[1:]:
        if a.startswith("--flag"):
            flag_ratio = float(a.split("=", 1)[1])
        elif a.startswith("--only"):
            only = a.split("=", 1)[1].split(",")
        elif a.startswith("--skip-first"):
            skip_first = int(a.split("=", 1)[1])

    spark = get_spark("scale_sweep")
    qs = entry.queries()
    if only is not None:
        unknown = [n for n in only if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        qs = {n: qs[n] for n in only}
    elif skip_first:
        qs = {n: f for i, (n, f) in enumerate(qs.items())
              if i >= skip_first}
    warm = next(iter(qs))
    qs[warm](spark, base).write.format("noop").mode("overwrite").save()
    release_all()

    def _alive(s) -> bool:
        try:
            s.range(1).count()
            return True
        except Exception:
            return False

    out: dict = {}
    skipped: list[str] = []
    for i, name in enumerate(qs):
        row = {}
        try:
            for label, d in (("base_sec", base), ("scaled_sec", scaled)):
                t0 = time.time()
                qs[name](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                row[label] = round(time.time() - t0, 2)
                release_all()
        except Exception as e:
            release_all()
            skipped.append(name)
            print(f"# [{i + 1}/{len(qs)}] {name}: SKIP "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:100]})",
                  file=sys.stderr)
            # an OOM kills the whole local JVM — revive the session so
            # one pathological query doesn't void the rest of the sweep
            if not _alive(spark):
                print(f"# JVM dead after {name}; restarting session",
                      file=sys.stderr)
                try:
                    spark.stop()
                except Exception:
                    pass
                # tool-only code: resetting these PRIVATE PySpark
                # attrs is the only way to force a brand-new JVM from
                # the same process once the old one is gone (stop()
                # alone leaves the dead session registered, verified
                # on PySpark 4.1). Guarded so a rename in a future
                # Spark merely degrades to "sweep ends here".
                try:
                    from pyspark.sql import SparkSession
                    SparkSession._instantiatedSession = None
                    SparkSession._activeSession = None
                except AttributeError:
                    print("# session-reset internals unavailable; "
                          "aborting sweep", file=sys.stderr)
                    break
                spark = get_spark("scale_sweep")
            continue
        row["ratio"] = round(row["scaled_sec"] / max(row["base_sec"],
                                                     0.01), 1)
        out[name] = row
        print(f"# [{i + 1}/{len(qs)}] {name}: {row['base_sec']}s -> "
              f"{row['scaled_sec']}s  ratio {row['ratio']}",
              file=sys.stderr)
    flagged = sorted((n for n, r in out.items()
                      if r["ratio"] > flag_ratio),
                     key=lambda n: -out[n]["ratio"])
    print(json.dumps({"metric": "scale_sweep", "base": base,
                      "scaled": scaled, "flag_ratio": flag_ratio,
                      "flagged": flagged, "n_skipped": len(skipped),
                      "skipped": skipped, "queries": out}))


if __name__ == "__main__":
    main()
