#!/usr/bin/env python3
"""A/B harness on task metrics, robust to host-interference bursts.

Runs named query variants in one session with the UI enabled and reports,
per variant run: wall, summed executor run time, summed executor CPU time,
task count, shuffle bytes — from the /api/v1 stages endpoint.  CPU time is
the comparison metric: scheduler noise and host stalls inflate wall but
not CPU.
"""
import json
import time
import urllib.request


def get_json(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


class Probe:
    def __init__(self, spark, port=4050):
        self.base = f"http://localhost:{port}/api/v1"
        self.app = get_json(f"{self.base}/applications")[0]["id"]

    def stages(self):
        return {
            s["stageId"]: s
            for s in get_json(
                f"{self.base}/applications/{self.app}/stages?status=complete"
            )
        }

    def stages_settled(self):
        """Poll until no new completed stages appear across two consecutive
        reads (r8 ADVICE: a fixed post-action sleep silently dropped stages
        still finalizing, quietly biasing the diff); warn when active
        stages remain after the polls."""
        prev = -1
        st = {}
        for _ in range(6):
            st = self.stages()
            if len(st) == prev:
                break
            prev = len(st)
            time.sleep(0.25)
        active = get_json(
            f"{self.base}/applications/{self.app}/stages?status=active"
        )
        if active:
            print(f"WARNING: {len(active)} stages still active at poll time")
        return st

    def run(self, label, thunk, n=3):
        out = []
        for i in range(n):
            before = set(self.stages())
            t0 = time.perf_counter()
            thunk()
            wall = time.perf_counter() - t0
            st = self.stages_settled()
            new = [st[k] for k in st if k not in before]
            row = {
                "label": label,
                "wall": round(wall, 3),
                "run_s": round(sum(s["executorRunTime"] for s in new) / 1e3, 3),
                "cpu_s": round(sum(s["executorCpuTime"] for s in new) / 1e9, 3),
                "tasks": sum(s["numCompleteTasks"] for s in new),
                "stages": len(new),
                "shuf_mb": round(
                    sum(s["shuffleWriteBytes"] for s in new) / 1e6, 2
                ),
            }
            out.append(row)
            print(
                f"{label:34s} wall={row['wall']:7.2f} run={row['run_s']:7.2f} "
                f"cpu={row['cpu_s']:7.2f} tasks={row['tasks']:4d} "
                f"stages={row['stages']:3d} shuf={row['shuf_mb']:8.2f}MB",
                flush=True,
            )
        return out
