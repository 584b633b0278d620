#!/usr/bin/env python3
"""Render a per-stage cost table from a Spark event log.

Usage: python3 tools/stage_profile.py <eventlog-file-or-dir> [topN]

For each completed stage: wall time (submission->completion), summed task
time, shuffle read/write bytes, memory/disk spill, input bytes, and the
stage's callsite name. Sorted by wall time descending. This is the
measurement SCALE.md stage diagnoses cite (round-12 verdict ask #1).
"""
import json
import os
import sys


def fmt_bytes(n):
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024.0:
            return f"{n:.1f}{unit}"
        n /= 1024.0
    return f"{n:.1f}PB"


def main():
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    if os.path.isdir(path):
        files = sorted(
            (os.path.join(path, f) for f in os.listdir(path)
             if not f.startswith(".")),
            key=os.path.getmtime)
        path = files[-1]
    stages = {}
    task_metrics = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = (info["Stage ID"], info["Stage Attempt ID"])
                stages[sid] = info
            elif kind == "SparkListenerTaskEnd":
                sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                agg = task_metrics.setdefault(sid, {
                    "run": 0, "tasks": 0, "srb": 0, "swb": 0,
                    "mem_spill": 0, "disk_spill": 0, "inp": 0})
                agg["tasks"] += 1
                agg["run"] += m.get("Executor Run Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                agg["srb"] += (sr.get("Local Bytes Read", 0)
                               + sr.get("Remote Bytes Read", 0))
                sw = m.get("Shuffle Write Metrics") or {}
                agg["swb"] += sw.get("Shuffle Bytes Written", 0)
                agg["mem_spill"] += m.get("Memory Bytes Spilled", 0)
                agg["disk_spill"] += m.get("Disk Bytes Spilled", 0)
                inp = m.get("Input Metrics") or {}
                agg["inp"] += inp.get("Bytes Read", 0)

    rows = []
    for sid, info in stages.items():
        sub = info.get("Submission Time")
        comp = info.get("Completion Time")
        if sub is None or comp is None:
            continue
        m = task_metrics.get(sid, {})
        rows.append({
            "stage": sid[0],
            "wall_s": (comp - sub) / 1000.0,
            "task_s": m.get("run", 0) / 1000.0,
            "tasks": m.get("tasks", 0),
            "input": m.get("inp", 0),
            "sh_read": m.get("srb", 0),
            "sh_write": m.get("swb", 0),
            "spill_disk": m.get("disk_spill", 0),
            "name": info.get("Stage Name", "")[:110],
        })
    rows.sort(key=lambda r: -r["wall_s"])
    total_wall = sum(r["wall_s"] for r in rows)
    print(f"{len(rows)} stages, summed stage wall {total_wall:.1f}s "
          f"(stages overlap; job wall is lower)")
    hdr = (f"{'stage':>5} {'wall_s':>8} {'task_s':>9} {'tasks':>6} "
           f"{'input':>9} {'sh_read':>9} {'sh_write':>9} {'spill':>9}  name")
    print(hdr)
    for r in rows[:top]:
        print(f"{r['stage']:>5} {r['wall_s']:>8.1f} {r['task_s']:>9.1f} "
              f"{r['tasks']:>6} {fmt_bytes(r['input']):>9} "
              f"{fmt_bytes(r['sh_read']):>9} {fmt_bytes(r['sh_write']):>9} "
              f"{fmt_bytes(r['spill_disk']):>9}  {r['name']}")


if __name__ == "__main__":
    main()
