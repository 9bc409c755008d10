"""Per-stage profile of a Spark event log — the scaling-gap analysis
tool (VERDICT r3 directive 5): attribute wall time, executor run time,
and shuffle volume per stage, grouped by the bench segment that
submitted it (bench.py tags each segment via setJobGroup).

Usage:
    python tools/stage_profile.py <event_log_file> [--top N]
    python tools/stage_profile.py <log_N> --compare <log_4N>

The compare mode prints, per segment and per dominant stage, the wall
time at both parallelism levels and the implied efficiency — this is
how the dominant exchange of the N->4N local-cluster gap was found.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def parse(path: str) -> dict:
    """-> {stages: {id: {...}}, segments: {segment: [stage ids]}}"""
    stage_seg: dict[int, str] = {}
    stages: dict[int, dict] = {}
    task_agg: dict[int, dict] = defaultdict(
        lambda: {"run_ms": 0, "sh_read": 0, "sh_write": 0,
                 "spill_mem": 0, "spill_disk": 0, "gc_ms": 0,
                 "fetch_wait_ms": 0, "write_ms": 0}
    )
    import os

    if os.path.isdir(path):  # rolling v2 layout: events_* files inside
        parts = sorted(
            os.path.join(path, p) for p in os.listdir(path)
            if p.startswith("events_")
        )
        if parts:
            path = parts[0]
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                seg = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id", "untagged"
                )
                for si in ev.get("Stage Infos", []):
                    stage_seg[si["Stage ID"]] = seg
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:80],
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_ms": (comp - sub) if sub and comp else 0,
                    "segment": stage_seg.get(sid, "untagged"),
                }
            elif t == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                m = ev.get("Task Metrics") or {}
                a = task_agg[sid]
                a["run_ms"] += m.get("Executor Run Time", 0)
                a["gc_ms"] += m.get("JVM GC Time", 0)
                a["spill_mem"] += m.get("Memory Bytes Spilled", 0)
                a["spill_disk"] += m.get("Disk Bytes Spilled", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                a["sh_read"] += (
                    sr.get("Local Bytes Read", 0)
                    + sr.get("Remote Bytes Read", 0)
                )
                a["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                a["sh_write"] += sw.get("Shuffle Bytes Written", 0)
                # event logs carry write time in NANOseconds
                a["write_ms"] += sw.get("Shuffle Write Time", 0) // 1_000_000
    for sid, s in stages.items():
        s.update(task_agg.get(sid, {}))
    return stages


def mb(n: int) -> str:
    return f"{n / 1e6:,.0f}MB" if n else "-"


def report(stages: dict, top: int) -> None:
    by_seg: dict[str, list] = defaultdict(list)
    for s in stages.values():
        by_seg[s["segment"]].append(s)
    seg_wall = {
        seg: sum(s["wall_ms"] for s in ss) for seg, ss in by_seg.items()
    }
    print(f"{'segment':28} {'stage-wall-sum':>14} {'stages':>7}")
    for seg, w in sorted(seg_wall.items(), key=lambda kv: -kv[1]):
        print(f"{seg:28} {w/1000:>13.1f}s {len(by_seg[seg]):>7}")
    print(f"\ntop {top} stages by wall time:")
    hdr = (f"{'wall':>8} {'run':>8} {'gc':>6} {'fetchw':>7} {'shread':>9} "
           f"{'shwrite':>9} {'spill':>9} {'tasks':>5}  segment/name")
    print(hdr)
    for s in sorted(stages.values(), key=lambda s: -s["wall_ms"])[:top]:
        print(
            f"{s['wall_ms']/1000:>7.1f}s {s.get('run_ms',0)/1000:>7.1f}s "
            f"{s.get('gc_ms',0)/1000:>5.1f}s {s.get('fetch_wait_ms',0)/1000:>6.1f}s "
            f"{mb(s.get('sh_read',0)):>9} {mb(s.get('sh_write',0)):>9} "
            f"{mb(s.get('spill_disk',0)):>9} {s['tasks']:>5}  "
            f"[{s['segment']}] {s['name']}"
        )


def compare(a: dict, b: dict, top: int) -> None:
    """a = level N log, b = level 4N log: per-segment efficiency."""
    def seg_wall(stages):
        w = defaultdict(int)
        for s in stages.values():
            w[s["segment"]] += s["wall_ms"]
        return w

    wa, wb = seg_wall(a), seg_wall(b)
    print(f"{'segment':28} {'N-wall':>9} {'4N-wall':>9} {'eff':>6}")
    for seg in sorted(set(wa) | set(wb), key=lambda s: -wa.get(s, 0)):
        ta, tb = wa.get(seg, 0), wb.get(seg, 0)
        eff = (ta / tb) / 4 if tb else float("nan")
        print(f"{seg:28} {ta/1000:>8.1f}s {tb/1000:>8.1f}s {eff:>6.2f}")


def main() -> None:
    # argparse (ADVICE r4): the hand-rolled split leaked option VALUES
    # into the positional list (`--top 5 <log>` read '5' as the log)
    import argparse  # noqa: PLC0415

    p = argparse.ArgumentParser(
        description="per-stage wall/shuffle/spill report from a Spark "
        "event log; --compare <4N-log> prints per-segment N->4N "
        "efficiency"
    )
    p.add_argument("log", help="event log file (level N)")
    p.add_argument("--top", type=int, default=25,
                   help="stages to list (default 25)")
    p.add_argument("--compare", metavar="LOG_4N",
                   help="second event log (level 4N) for efficiency")
    ns = p.parse_args()
    if ns.compare:
        compare(parse(ns.log), parse(ns.compare), ns.top)
        return
    report(parse(ns.log), ns.top)


if __name__ == "__main__":
    main()
