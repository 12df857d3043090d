"""Time every registry query once (noop sink) — optimization triage.

Prints one JSON object {name: seconds} sorted slowest-first, plus a
total. One rep per query (triage, not a bench): queries whose noop
action is preceded by driver-side work (scratch writes, collects)
bill that work too, exactly as the driver's correctness run pays it.

Usage:
    PYTHONPATH=/root/repo python tools/time_registry.py [--sf-dir D] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from fbs_data_pipelines_spark.caching import release_cache
    from fbs_data_pipelines_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    spark = get_spark(app_name="time-registry")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = entry_mod.queries()
    names = args or list(queries)
    out: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            out[name] = round(time.time() - t0, 3)
            release_cache(df)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"{name}: {out.get(name, 'ERR')}", file=sys.stderr)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps({
        "sf_dir": sf_dir,
        "total": round(sum(out.values()), 3),
        "n": len(out),
        "errors": errors,
        "queries": ranked,
    }))


if __name__ == "__main__":
    main()
