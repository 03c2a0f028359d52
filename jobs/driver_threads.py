"""Attribute driver-JVM CPU to thread groups during a CDC replay leg.

The cluster harness's per-role attribution (2026-08-19) showed the driver
JVM burning as many CPU-seconds as the executors (460-570 s/leg) — a
constant-node cost that caps any measured executor scaling at ~2x.  This
job answers WHERE: it launches a replay under ``local-cluster[N,c,mem]``
(or ``local[N]``), samples every driver-JVM thread's utime+stime from
``/proc/<pid>/task/<tid>/stat`` twice a second, and aggregates by thread
name (``comm``, normalized: trailing digits stripped so
``broadcast-exchange-0..15`` fold into one row).

Run:  python jobs/driver_threads.py [--docs 200000] [--events-per-doc 8]
      [--batches 2] [--mode cluster|local] [--n-exec 1] [--exec-cores 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cluster_scaling import SPARK_SUBMIT, prep_input, zip_pkg  # noqa: E402

_TICK = os.sysconf("SC_CLK_TCK")


class ThreadSampler(threading.Thread):
    """Accumulate per-thread-group CPU ticks for one process tree role."""

    def __init__(self, match_cmd: str, t0_marker: str | None = None):
        super().__init__(daemon=True)
        self.match_cmd = match_cmd
        self.groups: dict[str, float] = {}
        self._last: dict[tuple[str, str], tuple[str, int]] = {}
        self._stopev = threading.Event()
        self._pids: set[str] = set()
        # timed-window scoping (matches _CpuAttributor): until the job
        # touches t0_marker (post-warmup), ticks only update _last; the
        # accumulated groups are reset at the marker so JIT/codegen warmup
        # CPU is excluded — keeping these rows comparable to the cluster
        # harness's scoped cpu_s they are meant to explain
        self._t0_marker = t0_marker
        self._armed = t0_marker is None

    def _find_pids(self) -> None:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or pid in self._pids:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode("utf-8", errors="replace")
            except OSError:
                continue
            if self.match_cmd in cmd:
                self._pids.add(pid)

    def run(self) -> None:
        while not self._stopev.is_set():
            if (not self._armed and self._t0_marker
                    and os.path.exists(self._t0_marker)):
                self.groups = {}
                self._armed = True
            self._find_pids()
            for pid in list(self._pids):
                tdir = f"/proc/{pid}/task"
                try:
                    tids = os.listdir(tdir)
                except OSError:
                    continue
                for tid in tids:
                    try:
                        with open(f"{tdir}/{tid}/stat") as f:
                            raw = f.read()
                    except OSError:
                        continue
                    name, rest = raw.split("(", 1)[1].rsplit(")", 1)
                    parts = rest.split()
                    ticks = int(parts[11]) + int(parts[12])
                    group = re.sub(r"[-_]?\d+$", "", name) or name
                    k = (pid, tid)
                    prev = self._last.get(k)
                    if prev is not None and prev[0] == group:
                        d = ticks - prev[1]
                        if d > 0:
                            self.groups[group] = self.groups.get(group, 0.0) + d / _TICK
                    else:
                        # first sighting: charge everything so far (threads
                        # born mid-leg start near zero anyway)
                        self.groups[group] = self.groups.get(group, 0.0) + ticks / _TICK
                    self._last[k] = (group, ticks)
            self._stopev.wait(0.5)

    def stop(self) -> dict[str, float]:
        self._stopev.set()
        self.join(timeout=5)
        return {k: round(v, 1) for k, v in sorted(
            self.groups.items(), key=lambda kv: -kv[1]) if v >= 0.5}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--events-per-doc", type=int, default=8)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--mode", choices=["cluster", "local"], default="cluster")
    ap.add_argument("--n-exec", type=int, default=1)
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mb", type=int, default=4096)
    ap.add_argument("--warmup-events", type=int, default=400_000,
                    help="untimed warmup replay (replay_job --warmup-events);"
                         " samplers baseline at the t0 marker, matching the"
                         " cluster harness's scoped cpu_s")
    args = ap.parse_args()
    n_events = args.docs * args.events_per_doc
    tmp = tempfile.mkdtemp(prefix="drv_threads_")
    try:
        zpath = zip_pkg(tmp)
        wh0, ev_dir, n_events = prep_input(tmp, args.docs, args.events_per_doc)
        wh = os.path.join(tmp, "wh_leg")
        shutil.copytree(wh0, wh)
        master = (
            f"local-cluster[{args.n_exec},{args.exec_cores},{args.exec_mb}]"
            if args.mode == "cluster" else f"local[{args.n_exec * args.exec_cores}]"
        )
        cmd = [
            SPARK_SUBMIT, "--master", master,
            "--driver-memory", "2g",
            "--conf", f"spark.sql.shuffle.partitions={max(4 * args.n_exec * args.exec_cores, 16)}",
            "--conf", "spark.ui.enabled=false",
            "--conf", f"spark.executor.memory={args.exec_mb}m",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "replay_job.py"),
            "--warehouse", wh, "--table", "sequences", "--migration-id", "drvprof",
            "--events", ev_dir, "--events-per-batch",
            str(max(n_events // args.batches, 1)), "--no-evolve-schema",
            "--warmup-events", str(args.warmup_events),
            "--t0-marker", os.path.join(tmp, "t0"),
        ]
        marker = os.path.join(tmp, "t0")
        drv = ThreadSampler("org.apache.spark.deploy.SparkSubmit", marker)
        exe = ThreadSampler("CoarseGrainedExecutorBackend", marker)
        t0 = time.monotonic()
        drv.start(); exe.start()
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        wall = time.monotonic() - t0
        dg, eg = drv.stop(), exe.stop()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
            raise SystemExit(1)
        out = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps({
            "mode": args.mode, "master": master, "wall_s": round(wall, 1),
            "apply_wall_s": out.get("wall_s"),
            "events_per_sec": out.get("events_per_sec"),
            "driver_cpu_s": round(sum(dg.values()), 1),
            "exec_cpu_s": round(sum(eg.values()), 1),
            "driver_threads": dg,
            "exec_threads_top": dict(list(eg.items())[:12]),
        }, indent=1))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
