"""One-off diagnostic: what does the driver JVM write GBs of on multi-exec legs?

Launches a single local-cluster[N,c,mem] replay leg (same shape as
jobs/cluster_scaling.py run_leg) and, while it runs, samples every file under
the leg's spark.local.dir + worker dirs, aggregating peak bytes by block-file
prefix (shuffle_, temp_shuffle_, broadcast_, rdd_, temp_local_, ...) and by
owning blockmgr dir, then maps each blockmgr/spark-* dir to the pid+role that
holds open fds there.  Output: one JSON report.

Motivation (round 5): N=1-exec legs show driver wchar ~0.4 GB; 4-exec legs
show driver wchar 10-15 GB and exec CPU +40% — cpu_eff ~0.72 vs the >=0.8
north rule.  Knowing WHICH blocks those bytes are tells us whether the cost
is AQE broadcast serving (driver-side), shuffle, or log piping — and whether
an engine/conf change can remove it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))

from cluster_scaling import (  # noqa: E402
    SPARK_SUBMIT, _CpuAttributor, prep_input, zip_pkg)


def _prefix(name: str) -> str:
    for p in ("temp_shuffle_", "shuffle_", "broadcast_", "rdd_",
              "temp_local_", "taskresult_"):
        if name.startswith(p):
            return p.rstrip("_")
    if name.endswith((".log", ".out", ".err")) or "std" in name:
        return "log"
    return "other"


class DirSampler(threading.Thread):
    def __init__(self, roots: list[str]):
        super().__init__(daemon=True)
        self.roots = roots
        self.peak_by_prefix: dict[str, int] = defaultdict(int)
        self.cur_by_prefix: dict[str, int] = defaultdict(int)
        self.peak_by_dir: dict[str, int] = defaultdict(int)
        self.seen_bytes_by_file: dict[str, int] = {}
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            cur_pref: dict[str, int] = defaultdict(int)
            cur_dir: dict[str, int] = defaultdict(int)
            for root in self.roots:
                for dirpath, _dirs, files in os.walk(root):
                    for fn in files:
                        fp = os.path.join(dirpath, fn)
                        try:
                            sz = os.path.getsize(fp)
                        except OSError:
                            continue
                        cur_pref[_prefix(fn)] += sz
                        # attribute to the top-level spark-*/blockmgr-* dir
                        rel = os.path.relpath(fp, root)
                        top = os.path.join(
                            os.path.basename(root), *rel.split(os.sep)[:2])
                        cur_dir[top] += sz
                        # cumulative-write proxy: track high-water per file
                        prev = self.seen_bytes_by_file.get(fp, 0)
                        if sz > prev:
                            self.seen_bytes_by_file[fp] = sz
            for k, v in cur_pref.items():
                self.peak_by_prefix[k] = max(self.peak_by_prefix[k], v)
            for k, v in cur_dir.items():
                self.peak_by_dir[k] = max(self.peak_by_dir[k], v)
            self.cur_by_prefix = cur_pref
            self._halt.wait(1.0)

    def stop(self) -> dict:
        self._halt.set()
        self.join(timeout=5)
        cum_by_prefix: dict[str, int] = defaultdict(int)
        for fp, sz in self.seen_bytes_by_file.items():
            cum_by_prefix[_prefix(os.path.basename(fp))] += sz
        mb = 1 << 20
        return {
            "peak_mb_by_prefix": {k: round(v / mb, 1)
                                  for k, v in sorted(self.peak_by_prefix.items())},
            "cumulative_mb_by_prefix": {k: round(v / mb, 1)
                                        for k, v in sorted(cum_by_prefix.items())},
            "peak_mb_by_dir": {k: round(v / mb, 1) for k, v in
                               sorted(self.peak_by_dir.items(),
                                      key=lambda kv: -kv[1])[:12]},
        }


class FdMapper(threading.Thread):
    """Map spark-*/blockmgr-* dirs -> (pid, role) via open fds, best effort."""

    def __init__(self):
        super().__init__(daemon=True)
        self.owner: dict[str, str] = {}
        self._halt = threading.Event()

    @staticmethod
    def _role(cmd: str) -> str | None:
        if "CoarseGrainedExecutorBackend" in cmd:
            return "exec"
        if "pyspark.daemon" in cmd:
            return "py"
        if "org.apache.spark.deploy.SparkSubmit" in cmd:
            return "driver"
        return None

    def run(self) -> None:
        while not self._halt.is_set():
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read().replace(b"\0", b" ").decode(
                            "utf-8", "replace")
                    role = self._role(cmd)
                    if role is None:
                        continue
                    for fd in os.listdir(f"/proc/{pid}/fd"):
                        try:
                            tgt = os.readlink(f"/proc/{pid}/fd/{fd}")
                        except OSError:
                            continue
                        for marker in ("blockmgr-", "spark-"):
                            i = tgt.find(marker)
                            if i >= 0:
                                key = tgt[i:].split("/")[0]
                                self.owner.setdefault(key, f"{role}:{pid}")
                except OSError:
                    continue
            self._halt.wait(2.0)

    def stop(self) -> dict[str, str]:
        self._halt.set()
        self.join(timeout=5)
        return self.owner


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--events-per-doc", type=int, default=8)
    ap.add_argument("--n-exec", type=int, default=4)
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--extra-conf", action="append", default=[])
    args = ap.parse_args()
    tmp = tempfile.mkdtemp(prefix="legprobe_", dir=args.workdir)
    try:
        zpath = zip_pkg(tmp)
        wh0, ev_dir, n_events = prep_input(
            tmp, args.docs, args.events_per_doc, buckets=args.buckets)
        wh = os.path.join(tmp, "wh_leg")
        shutil.copytree(wh0, wh)
        localdir = os.path.join(tmp, "sparklocal")
        workerdir = os.path.join(tmp, "workerdir")
        os.makedirs(localdir, exist_ok=True)
        os.makedirs(workerdir, exist_ok=True)
        parts = max(4 * args.n_exec * args.exec_cores, 16)
        cmd = [
            SPARK_SUBMIT, "--master",
            f"local-cluster[{args.n_exec},{args.exec_cores},2048]",
            "--driver-memory", "2g",
            "--conf", f"spark.sql.shuffle.partitions={parts}",
            "--conf", f"spark.local.dir={localdir}",
            "--conf", "spark.locality.wait=0s",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.executor.memory=2048m",
            "--conf", f"spark.worker.dir={workerdir}",
        ]
        for c in args.extra_conf:
            cmd += ["--conf", c]
        cmd += [
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "replay_job.py"),
            "--warehouse", wh, "--table", "sequences",
            "--migration-id", "probe", "--events", ev_dir,
            "--events-per-batch", str(n_events), "--no-evolve-schema",
        ]
        samp = DirSampler([localdir, workerdir, tmp])
        fdm = FdMapper()
        samp.start()
        fdm.start()
        t0 = time.monotonic()
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        attrib = _CpuAttributor(root_pid=proc.pid)
        attrib.start()
        out_s, err_s = proc.communicate(timeout=1800)
        r = subprocess.CompletedProcess(cmd, proc.returncode, out_s, err_s)
        wall = time.monotonic() - t0
        cpu_s = attrib.stop()
        io_mb = attrib.io_mb()
        dirs = samp.stop()
        owners = fdm.stop()
        job_line = None
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                job_line = json.loads(ln)
        print(json.dumps({
            "n_exec": args.n_exec, "events": n_events,
            "wall_s": round(wall, 1), "rc": r.returncode,
            "job": {k: job_line.get(k) for k in
                    ("wall_s", "events_per_sec", "prestage_s")} if job_line
            else None,
            "cpu_s": cpu_s,
            "io_mb": io_mb,
            "blocks": dirs,
            "dir_owners": owners,
        }, indent=1))
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-1500:] + "\n" + r.stderr[-3000:])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
