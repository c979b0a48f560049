#!/usr/bin/env python
"""Per-query stage/time profile of the bench set (guide §1/§7).

Runs each bench=True query once (same .count() action as bench.py) with
a job description label and Spark event logging on, then parses the
event log into a per-query breakdown: jobs, stages, task time, max
single-task time, and the slowest stages overall.

Usage: python scripts/profile_bench.py [out_json] [-- only names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/dew-eventlog"


def main() -> None:
    only = set()
    if "--" in sys.argv:
        only = set(sys.argv[sys.argv.index("--") + 1 :])
    out_json = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "--" else "/tmp/profile_bench.json"

    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession

    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.session import RUNTIME_DEFAULTS, ensure_session_defaults

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("dew-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
    )
    for k, v in RUNTIME_DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_session_defaults(spark)
    app_id = spark.sparkContext.applicationId

    registry = load_all()
    names = sorted(n for n, s in registry.items() if s.bench and (not only or n in only))

    walls = {}
    for phase in ("warm", "timed"):
        for name in names:
            spark.sparkContext.setJobDescription(f"{phase}:{name}")
            t0 = time.perf_counter()
            registry[name].fn(spark, SF_DIR).count()
            walls[f"{phase}:{name}"] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    # print walls immediately so a parse failure can't lose them
    print(json.dumps({"walls": walls}))

    # ---- parse event log (plain file, or rolled dir with zstd parts) ----
    def _read_event_lines() -> list[str]:
        plain = Path(EVDIR) / app_id
        if plain.is_file():
            return plain.read_text().splitlines()
        rolled = Path(EVDIR) / f"eventlog_v2_{app_id}"
        lines: list[str] = []
        import pyarrow as pa

        for part in sorted(rolled.glob(f"events_*_{app_id}*")):
            if part.suffix == ".zstd":
                data = pa.CompressedInputStream(
                    pa.OSFile(str(part), "rb"), "zstd"
                ).read().decode()
            else:
                data = part.read_text()
            lines.extend(data.splitlines())
        return lines

    jobs: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}
    if True:
        for line in _read_event_lines():
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                desc = (e.get("Properties") or {}).get("spark.job.description", "?")
                jobs[e["Job ID"]] = desc
                job_stages[e["Job ID"]] = [s["Stage ID"] for s in e.get("Stage Infos", [])]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stage_info[sid] = {
                    "name": si.get("Stage Name", "")[:90],
                    "tasks": si.get("Number of Tasks"),
                    "wall_ms": (comp - sub) if sub and comp else None,
                }
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                d = stage_info.setdefault(sid, {})
                ti = e.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) or 0) - (ti.get("Launch Time", 0) or 0)
                d["task_ms_sum"] = d.get("task_ms_sum", 0) + dur
                d["task_ms_max"] = max(d.get("task_ms_max", 0), dur)

    per_query: dict[str, dict] = defaultdict(lambda: {"jobs": 0, "stages": 0, "stage_wall_ms": 0, "task_ms": 0})
    stage_rows = []
    for jid, desc in jobs.items():
        q = per_query[desc]
        q["jobs"] += 1
        for sid in job_stages.get(jid, []):
            si = stage_info.get(sid)
            if not si or si.get("wall_ms") is None:
                continue  # skipped stage (reused exchange) or still running
            q["stages"] += 1
            q["stage_wall_ms"] += si["wall_ms"]
            q["task_ms"] += si.get("task_ms_sum", 0)
            stage_rows.append(
                {"desc": desc, "stage": sid, "wall_ms": si["wall_ms"],
                 "tasks": si.get("tasks"), "task_ms_max": si.get("task_ms_max", 0),
                 "name": si.get("name", "")}
            )

    for k in sorted(per_query):
        per_query[k]["wall_s"] = walls.get(k)
    result = {
        "per_query": {k: dict(v) for k, v in sorted(per_query.items())},
        "slowest_stages": sorted(stage_rows, key=lambda r: -r["wall_ms"])[:40],
    }
    Path(out_json).write_text(json.dumps(result, indent=1))
    print(f"wrote {out_json}")
    for k, v in sorted(per_query.items(), key=lambda kv: -(kv[1].get("wall_s") or 0)):
        if k.startswith("timed:"):
            print(f"{k}: wall={v.get('wall_s')}s stage_wall={v['stage_wall_ms']/1000:.2f}s "
                  f"jobs={v['jobs']} stages={v['stages']}")


if __name__ == "__main__":
    main()
