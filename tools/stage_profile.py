"""Per-job/stage profile for catalog queries — the measure-first tool
for the optimization rounds (guide §1: decide whether time goes to
shuffle, compute, or per-job orchestration BEFORE touching a plan).

Runs each named query exactly as bench.py does (same warm-up contract:
interleaved sf0.001 compile-warm, then the timed noop-sink run at
--sf), with ``spark.eventLog.enabled`` on, then parses the event log
and attributes every Spark job to its query via job descriptions.

    python tools/stage_profile.py cp1_curated_corpus cm1_corpus_manifest

Prints, per query: wall seconds, number of jobs, and per-job wall +
dominant stages (task time, shuffle read/write bytes, rows). The job
count is the headline signal on small scale factors: a 5000-doc corpus
cannot make 20 seconds of DATA work, so a slow line is paying per-job
orchestration (collects, checkpoints, pins) — exactly the passes and
barriers that also bound the 100 TB shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    warm_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import shutil

    log_dir = "/tmp/spark_profile_logs"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.plans import QUERIES as SPECS
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark(
        "stage_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file:{log_dir}",
        },
    )
    qs = entry_mod.queries()
    sc = spark.sparkContext

    # same global warm as bench.py: footers + codegen infra + workers
    qs["k7_top5_preview"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    walls: dict[str, float] = {}
    for name in names:
        sc.setJobDescription(f"warm:{name}")
        if os.path.isdir(warm_dir):
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — warm must never fail a profile
                pass
        sc.setJobDescription(f"timed:{name}")
        eager = SPECS[name].eager
        t0 = time.time() if eager else 0.0
        df = qs[name](spark, sf_dir)
        if not eager:
            t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls[name] = time.time() - t0
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log (Spark 4 writes a v2 directory) -----------
    paths: list[str] = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if f.startswith("events") or f == app_id:
                paths.append(os.path.join(root, f))
    if not paths:
        raise SystemExit(f"no event log found under {log_dir}")
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}

    def _lines():
        import io

        for p in sorted(paths):
            if p.endswith(".zstd"):
                raise SystemExit(
                    "compressed event log — spark.eventLog.compress should "
                    "be false (no zstandard module in the sandbox)"
                )
            with open(p) as fh:
                yield from fh

    for line in _lines():
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            jobs[jid] = {
                "desc": desc,
                "t0": ev["Submission Time"],
                "stages": [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            acc = {
                a.get("Name"): a.get("Value")
                for a in si.get("Accumulables", [])
            }
            scopes = []
            for r in si.get("RDD Info", []):
                scope_json = r.get("Scope")
                if scope_json:
                    try:
                        nm = json.loads(scope_json).get("name", "")
                    except Exception:  # noqa: BLE001
                        nm = ""
                    if nm and nm not in scopes:
                        scopes.append(nm)
            stages[sid] = {
                "scopes": scopes,
                "name": si.get("Stage Name", ""),
                "tasks": si.get("Number of Tasks", 0),
                "ms": (si.get("Completion Time", 0) or 0)
                - (si.get("Submission Time", 0) or 0),
                "sh_r": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                or 0,
                "sh_rl": acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                or 0,
                "sh_w": acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                or 0,
                "out_rows": acc.get("number of output rows", 0) or 0,
            }

    per_q: dict[str, list] = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        d = j["desc"]
        if not d.startswith("timed:"):
            continue
        per_q.setdefault(d[6:], []).append((jid, j))

    for name in names:
        print(f"\n=== {name}  wall={walls.get(name, -1):.2f}s ===")
        js = per_q.get(name, [])
        tot = sum(j["t1"] - j["t0"] for _, j in js if "t1" in j) / 1000.0
        print(f"jobs={len(js)}  sum(job wall)={tot:.2f}s")
        for jid, j in js:
            if "t1" not in j:
                continue
            ms = j["t1"] - j["t0"]
            sts = [
                (sid, stages[sid]) for sid in j["stages"] if sid in stages
            ]
            sts.sort(key=lambda kv: -kv[1]["ms"])
            head = "; ".join(
                f"s{sid} {s['ms']}ms t{s['tasks']} "
                f"shW={s['sh_w']//1024}K shR={(s['sh_r']+s['sh_rl'])//1024}K"
                for sid, s in sts[:3]
            )
            stage_names = " | ".join(
                ",".join(s.get("scopes", [])[:5])[:110]
                or s["name"].split("\n")[0][:40]
                for _, s in sts[:2]
            )
            print(f"  job{jid:4d} {ms:6d}ms  [{head}]  {stage_names}")


if __name__ == "__main__":
    main()
