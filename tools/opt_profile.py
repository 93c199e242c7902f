"""Per-query optimization profiler (rounds 12/13, guide §1).

For each named query: run it N times through the bench's noop sink
(min wall kept), count the Spark jobs it launches via a per-query job
group, and optionally dump ``explain("formatted")`` to
``plans/<round>/<name>_<tag>.txt`` (``--round r13`` default).

Usage:
  python3 tools/opt_profile.py [--sf DIR] [--plans TAG] [--round rNN] query [...]
  python3 tools/opt_profile.py --top N          # N slowest from BENCH_DETAIL.json

Prints one line per query:  <name> wall_min=<s> runs=[..] jobs=<n>

Caveat (ADVICE r12): ``jobs`` is the job count of the LAST run's job
group; the status tracker can evict old jobs on very long sessions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entrymod  # noqa: E402
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    plans_tag = None
    plans_round = "r13"
    names: list[str] = []
    runs = 2
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif a == "--round":
            plans_round = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--top":
            n = int(args[i + 1])
            i += 2
            detail = json.load(
                open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json"))
            )
            names += [
                q
                for q, _ in sorted(
                    detail["queries"].items(), key=lambda kv: -kv[1]
                )[:n]
            ]
        else:
            names.append(a)
            i += 1

    entrymod.set_lsh_prefilter(True)  # bench parity: the timed scale path
    spark = get_spark(app_name="opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sc = spark.sparkContext

    # bench-parity warmup: page-cache warm the sf dir once
    import glob

    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", plans_round)
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in names:
        walls = []
        jobs_count = None
        for r in range(runs):
            group = f"prof:{name}:{r}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            # max across runs (ADVICE r12: last-run-only under-reported
            # when a run raced status-tracker eviction)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            jobs_count = n_jobs if jobs_count is None else max(jobs_count, n_jobs)
            sc.setJobGroup("idle", "idle")
        if plans_tag:
            try:
                df = qs[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    qs[name](spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(
                os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        results[name] = {"wall_min": min(walls), "runs": walls, "jobs": jobs_count}
        print(
            f"{name:32s} wall_min={min(walls):7.3f} runs={walls} jobs={jobs_count}",
            flush=True,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
