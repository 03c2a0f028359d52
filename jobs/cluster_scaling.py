"""Multi-executor scaling evidence: spark-submit on local-cluster[N] vs [4N].

Supplements :mod:`jobs.scaling_bench` (the headline pinned ``local[N]``
pairs): the north rule's deployment shape is ``spark-submit --py-files`` on
a cluster at two cluster sizes.  ``local-cluster[N,1,mem]`` launches N REAL
worker JVMs — distinct processes, so package distribution, task
serialization, broadcast and shuffle all cross process boundaries — the
closest sandbox analog to an N-executor cluster.  Protocol matches the
headline harness: input generated ONCE and copied per leg, legs run
back-to-back in fresh JVM trees taskset-pinned to exactly their core
budget, each pair behind the pre-registered host-window gate, median pair
efficiency reported.

Run:  python jobs/cluster_scaling.py [--docs 100000] [--events-per-doc 8]
Writes BENCH/CLUSTER.md + appends raw rows to BENCH/cluster_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (  # noqa: E402
    EIGHT_PROC_SPEEDUP,
    LegSampler,
    _git_commit,
    host_probe,
    host_probe_io,
)

SPARK_SUBMIT = os.path.join(
    os.path.dirname(os.path.dirname(shutil.which("python") or sys.executable)),
    "bin", "spark-submit",
)
if not os.path.exists(SPARK_SUBMIT):
    SPARK_SUBMIT = shutil.which("spark-submit") or "spark-submit"


def zip_pkg(tmp: str) -> str:
    zpath = os.path.join(tmp, "mbdm.zip")
    pkg = os.path.join(REPO, "mongo_bulk_data_migration_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def prep_input(tmp: str, docs: int, events_per_doc: int) -> tuple[str, str, int]:
    """Generate the deterministic table + event log once (local[4] session)."""
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.session import get_spark
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        SEQUENCES_SCHEMA, changes_df, sequences_df)

    n_events = docs * events_per_doc
    spark = get_spark(app_name="cluster-prep", master="local[4]", shuffle_partitions=4)
    wh = os.path.join(tmp, "wh0")
    cat = Catalog(wh)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, num_buckets=8)
    t.append(sequences_df(spark, docs, parallelism=4))
    ev_dir = os.path.join(tmp, "events")
    changes_df(spark, docs, n_events, n_parts=4, parallelism=4).write.parquet(ev_dir)
    spark.stop()
    return wh, ev_dir, n_events


def run_leg(tmp: str, zpath: str, wh0: str, ev_dir: str, n_exec: int,
            events_per_batch: int, tag: str, exec_mb: int = 2048) -> dict:
    wh = os.path.join(tmp, f"wh_{tag}")
    shutil.copytree(wh0, wh)
    cmd = [
        SPARK_SUBMIT, "--master", f"local-cluster[{n_exec},1,{exec_mb}]",
        "--driver-memory", "2g",
        "--conf", f"spark.sql.shuffle.partitions={n_exec}",
        "--conf", "spark.ui.enabled=false",
        f"--conf", f"spark.executor.memory={exec_mb}m",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--warehouse", wh, "--table", "sequences", "--migration-id", f"cs-{tag}",
        "--events", ev_dir, "--events-per-batch", str(events_per_batch),
        "--no-evolve-schema",
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{n_exec - 1}"] + cmd
    t0 = time.monotonic()
    sampler = LegSampler()
    sampler.start()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    finally:
        during = sampler.stop()
    submit_wall = time.monotonic() - t0
    shutil.rmtree(wh, ignore_errors=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-3000:])
        raise RuntimeError(f"leg {tag} failed")
    out = json.loads(r.stdout.strip().splitlines()[-1])
    out["n_exec"] = n_exec
    out["submit_wall_s"] = round(submit_wall, 2)
    out["during_probe_mops"] = during
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--events-per-doc", type=int, default=8)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--n-exec", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--window-gate-frac", type=float, default=0.7)
    ap.add_argument("--exec-mb", type=int, default=4096)
    ap.add_argument("--window-wait-s", type=int, default=60)
    ap.add_argument("--window-max-waits", type=int, default=10)
    args = ap.parse_args()
    xn = 4 * args.n_exec
    n_events = args.docs * args.events_per_doc
    epb = max(n_events // args.batches, 1)
    commit = _git_commit()

    tmp = tempfile.mkdtemp(prefix="cluster_scale_")
    log_path = os.path.join(REPO, "BENCH", "cluster_runs.jsonl")
    pairs = []
    try:
        zpath = zip_pkg(tmp)
        wh0, ev_dir, n_events = prep_input(tmp, args.docs, args.events_per_doc)
        per_core = host_probe(1, 8_000_000)
        for i in range(args.repeats):
            need = args.window_gate_frac * xn * per_core
            for w in range(args.window_max_waits + 1):
                gate = host_probe(xn)
                if gate >= need:
                    break
                print(json.dumps({"window_gate": {"pair": i, "probe_mops": gate,
                                                  "need_mops": round(need, 1),
                                                  "wait": w}}), flush=True)
                time.sleep(args.window_wait_s)
            else:
                print(json.dumps({"window_gate_skip": {"pair": i}}), flush=True)
                continue
            p0 = host_probe()
            r_n = run_leg(tmp, zpath, wh0, ev_dir, args.n_exec, epb, f"p{i}n", args.exec_mb)
            p1 = host_probe()
            r_4n = run_leg(tmp, zpath, wh0, ev_dir, xn, epb, f"p{i}x", args.exec_mb)
            p2 = host_probe()
            eff = (r_4n["events_per_sec"] / r_n["events_per_sec"]) / (xn / args.n_exec)
            # pre-registered during-leg hold rule (same as scaling_bench)
            bar8 = round(args.window_gate_frac * EIGHT_PROC_SPEEDUP * per_core, 1)
            held = all(
                min(leg.get("during_probe_mops") or [bar8]) >= bar8
                for leg in (r_n, r_4n)
            )
            for leg in (r_n, r_4n):
                leg["held"] = held
                leg["held_bar_mops"] = bar8
            pair = {"n": r_n, "4n": r_4n, "eff": round(eff, 3),
                    "probes": [p0, p1, p2], "held": held}
            pairs.append(pair)
            os.makedirs(os.path.dirname(log_path), exist_ok=True)
            with open(log_path, "a") as f:
                for r, pr in ((r_n, [p0, p1]), (r_4n, [p1, p2])):
                    f.write(json.dumps({**r, "n_docs": args.docs,
                                        "n_events": n_events, "commit": commit,
                                        "pair": i, "host_probe_mops": pr,
                                        "host_io_mbps": host_probe_io(),
                                        "mode": "local-cluster", "pinned": True}) + "\n")
            print(json.dumps(pair), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    if not pairs:
        sys.stderr.write("no pairs ran this session (window gate never passed)\n")
    write_report(log_path)


def write_report(log_path: str) -> None:
    """Rebuild BENCH/CLUSTER.md from the FULL raw history, every run.

    A session whose every pair sheared must not overwrite clean evidence
    from an earlier window with scheduler noise — the report always shows
    all pair groups, classifies each pair (held / SHEARED / no-sampler for
    pre-sampler rows), and takes each group's median over held pairs only.
    """
    rows = []
    if os.path.exists(log_path):
        with open(log_path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    by_pair: dict[tuple, dict] = {}
    for r in rows:
        k = (r["n_events"], r["commit"], r["pair"])
        by_pair.setdefault(k, {})[r["n_exec"]] = r
    groups: dict[tuple, list] = {}
    for (n_events, commit, pidx), legs in sorted(by_pair.items()):
        ns = sorted(legs)
        if len(ns) != 2 or ns[1] != 4 * ns[0]:
            continue  # interrupted pair
        lo, hi = legs[ns[0]], legs[ns[1]]
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (ns[1] / ns[0])
        sampled = "during_probe_mops" in lo or "during_probe_mops" in hi
        held = lo.get("held", None) if sampled else None
        cls = ("held" if held else "SHEARED") if sampled else "no-sampler"
        groups.setdefault((n_events, commit), []).append(
            {"pair": pidx, "lo": lo, "hi": hi, "eff": eff, "cls": cls}
        )

    sections = []
    summary = []
    for (n_events, commit), ps in sorted(groups.items()):
        lines = "\n".join(
            "| {} | {:,.0f} | {:,.0f} | {:.3f} | {} | {} |".format(
                p["pair"], p["lo"]["events_per_sec"], p["hi"]["events_per_sec"],
                p["eff"], p["cls"],
                min(p["lo"].get("host_probe_mops", []) +
                    p["hi"].get("host_probe_mops", []) or [0]))
            for p in ps
        )
        ok = sorted(p["eff"] for p in ps if p["cls"] != "SHEARED")
        med = f"{ok[len(ok) // 2]:.3f}" if ok else "—"
        n_shear = sum(p["cls"] == "SHEARED" for p in ps)
        note = f" ({n_shear}/{len(ps)} sheared, excluded)" if n_shear else ""
        summary.append(f"| {n_events:,} | {commit} | {len(ps)} | {med}{note} |")
        sections.append(
            f"### {n_events:,} events (commit {commit}) — median of "
            f"rule-passing pairs: **{med}**{note}\n\n"
            "| pair | N ev/s | 4N ev/s | eff | hold rule | min bracket probe |\n"
            "|---|---|---|---|---|---|\n" + lines
        )

    md = """# BENCH/CLUSTER — multi-executor (separate worker JVMs) scaling pairs

Same replay job as the headline `BENCH/BASELINE.md` pairs, but deployed the
north rule's way: `spark-submit --py-files mbdm.zip jobs/replay_job.py` on
`local-cluster[N,1,mem]` vs `local-cluster[4N,1,mem]` — each executor a REAL
separate worker JVM (package distribution, task serialization, broadcast and
shuffle all cross process boundaries).  Input generated once and copied per
leg; legs taskset-pinned to exactly their core budget; pairs window-gated;
the during-leg sampler classifies each pair held/SHEARED (pre-sampler rows:
`no-sampler`, judged by bracket probes only).  This report is rebuilt from
the FULL `BENCH/cluster_runs.jsonl` history on every run, so an all-sheared
session records its rows without overwriting clean-window evidence.

| events | commit | pairs | median eff (rule-passing) |
|---|---|---|---|
""" + "\n".join(summary) + """

A `—` median means NO pair in that group survived the hold rule — those
sessions measure the host scheduler, not the engine, and are retained only
as raw rows.  The 800k-event group is serial-cost-dominated (see the Amdahl
decomposition in `BENCH/BASELINE.md`: per-batch driver-side cost S is
constant, so small workloads under-read scaling); the 3.2M+ groups carry
the cluster-topology scaling claim when a held pair exists.  The headline
scaling evidence remains the larger-workload `BENCH/BASELINE.md` local[N]
table; this file evidences that the SAME job, deployed in the true
multi-executor topology, scales comparably — the engine's
partition-parallel plan, not single-JVM thread sharing, carries the
speedup.

""" + "\n\n".join(sections) + "\n"
    with open(os.path.join(REPO, "BENCH", "CLUSTER.md"), "w") as f:
        f.write(md)
    print(json.dumps({"groups": {f"{k[0]}@{k[1]}": len(v)
                                 for k, v in groups.items()}}))


if __name__ == "__main__":
    if "--report-only" in sys.argv:
        write_report(os.path.join(REPO, "BENCH", "cluster_runs.jsonl"))
    else:
        main()
