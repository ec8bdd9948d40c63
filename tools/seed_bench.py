"""Seed BASELINE.md trend entries for queries newly added to bench.py's
HEADLINE list.

Methodology must match bench.py exactly (clear cache before each query,
min of PASSES back-to-back passes) and the established seeding rule from
BASELINE.md: run the whole measurement TWICE back-to-back and seed from the
LARGER of the two record mins, so the stall guard is not over-tight on
higher-variance queries.

Usage: python tools/seed_bench.py [sf_dir] query [query ...]
Prints one `"name": value,` line per query, ready to paste into
bench.py BASELINE_SEC, plus a markdown table for BASELINE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apache_kafka_clickhouse_demo_spark import queries as Q  # noqa: E402
from apache_kafka_clickhouse_demo_spark.session import get_spark  # noqa: E402

PASSES = 3


def _run_one(spark, name: str, sf_dir: str) -> float:
    all_queries = {**Q.QUERIES, **Q.EXTRA_QUERIES}
    spark.catalog.clearCache()
    times: list[float] = []
    for _ in range(PASSES):
        t0 = time.time()
        df = all_queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return min(times)


def main() -> int:
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    spark = get_spark(app_name="seed_bench")
    all_queries = {**Q.QUERIES, **Q.EXTRA_QUERIES}
    spark.catalog.clearCache()
    all_queries["count_events"](spark, sf_dir).collect()  # warm-up

    records: dict[str, tuple[float, float]] = {}
    for name in names:
        a = _run_one(spark, name, sf_dir)
        b = _run_one(spark, name, sf_dir)
        records[name] = (a, b)
        print(f"# {name}: record1={a:.3f} record2={b:.3f}", flush=True)

    print("\n# paste into bench.py BASELINE_SEC:")
    for name, (a, b) in records.items():
        print(f'    "{name}": {max(a, b):.3f},')
    print("\n# markdown rows for BASELINE.md:")
    for name, (a, b) in records.items():
        print(f"| {name} | {max(a, b):.3f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
