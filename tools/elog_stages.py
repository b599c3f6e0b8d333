"""Stage-level task-metric summary for one arm label.

  python tools/elog_stages.py <eventlog_dir> <label_substring>

Per stage: wall, ntasks, sum executorRunTime, sum deserialize, sum GC,
sum result-serialize, sum scheduler-visible gap (wall*slots - accounted).
"""
import json, sys
from collections import defaultdict
from elog_profile import iter_lines


def main():
    path, want = sys.argv[1], sys.argv[2]
    stage_label = {}
    stage_meta = {}
    tasks = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, run, deser, gc, ser, launch2finish
    for raw in iter_lines(path):
        try:
            e = json.loads(raw)
        except Exception:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            label = (e.get("Properties") or {}).get(
                "spark.job.description") or "(none)"
            for si in e.get("Stage Infos", []):
                stage_label[si["Stage ID"]] = label
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sub, done = si.get("Submission Time"), si.get("Completion Time")
            if sub and done:
                stage_meta[si["Stage ID"]] = (
                    (done - sub) / 1000.0, si.get("Number of Tasks", 0),
                    si.get("Stage Name", "?"))
        elif ev == "SparkListenerTaskEnd":
            sid = e.get("Stage ID")
            if want not in stage_label.get(sid, ""):
                continue
            m = e.get("Task Metrics") or {}
            ti = e.get("Task Info") or {}
            t = tasks[sid]
            t[0] += 1
            t[1] += m.get("Executor Run Time", 0)
            t[2] += m.get("Executor Deserialize Time", 0)
            t[3] += m.get("JVM GC Time", 0)
            t[4] += m.get("Result Serialization Time", 0)
            t[5] += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
    rows = []
    for sid, t in tasks.items():
        wall, n, name = stage_meta.get(sid, (0.0, t[0], "?"))
        rows.append((wall, sid, t, name))
    rows.sort(reverse=True)
    for wall, sid, t, name in rows[:25]:
        print(f"s{sid:5d} wall={wall:5.2f}s n={t[0]:4d} run={t[1]/1000:6.2f}s "
              f"deser={t[2]/1000:5.2f}s gc={t[3]/1000:5.2f}s "
              f"l2f={t[5]/1000:6.2f}s  {name[:70]}")


if __name__ == "__main__":
    main()
