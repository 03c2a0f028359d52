"""spark-submit deployment-shape smoke test (the north rule's run mode).

Packages the engine as --py-files, submits jobs/replay_job.py against a tiny
warehouse, and checks the applied state + the resume no-op + rollback —
through the REAL spark-submit entry path, not an in-process session.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _zip_pkg(tmp_path) -> str:
    zpath = str(tmp_path / "mbdm.zip")
    pkg = os.path.join(REPO, "mongo_bulk_data_migration_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_replay_resume_rollback(spark, tmp_path):
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.simulator import OracleSimulator
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        CHANGES_SCHEMA,
        SEQUENCES_SCHEMA,
        make_changes,
        make_sequences,
    )

    from conftest import rows_of

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    t = cat.create_table("seq", SEQUENCES_SCHEMA, num_buckets=4)
    rows = make_sequences(30)
    t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))
    events = make_changes(30, 80, n_parts=4, n_batches=2)
    ev_dir = str(tmp_path / "events")
    spark.createDataFrame(events, CHANGES_SCHEMA).write.parquet(ev_dir)

    def submit(*extra):
        cmd = [
            SPARK_SUBMIT, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", _zip_pkg(tmp_path),
            os.path.join(REPO, "jobs", "replay_job.py"),
            "--warehouse", wh, "--table", "seq", "--migration-id", "submit1",
            "--events", ev_dir, "--events-per-batch", "40", *extra,
        ]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = submit()
    assert out["batches"] == 2 and out["events"] == 80

    sim = OracleSimulator(rows)
    for b in range(2):
        sim.apply_batch([e for e in events if e["seq"] // 40 == b])
    got = {r["doc_id"]: r for r in rows_of(cat.load_table("seq").read(spark))}
    want = {r["doc_id"]: r for r in sim.rows()}
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["tokens"] == w["tokens"]

    # resume: second submit of the same log is a no-op (HWM + markers)
    out2 = submit()
    assert out2["batches"] == 0 or out2["events"] == 0

    # rollback through the same CLI restores the initial table
    rb = submit("--rollback")
    assert "rollback" in rb
    init = {r["doc_id"]: r for r in rows}
    got = {r["doc_id"]: r for r in rows_of(cat.load_table("seq").read(spark))}
    assert set(got) == set(init)
    for k, w in init.items():
        assert got[k]["tokens"] == w["tokens"]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_multi_executor_cluster(spark, tmp_path):
    """The north-rule deployment shape on a REAL multi-executor topology:
    `local-cluster[2,1,1024]` spawns two separate worker JVMs, so --py-files
    distribution, task serialization, broadcast, and shuffle all cross
    process boundaries exactly as on a standalone/YARN cluster — local[N]
    cannot exercise any of that.  The applied state must match the oracle
    simulator, same as the single-JVM path."""
    from mongo_bulk_data_migration_spark import Catalog
    from mongo_bulk_data_migration_spark.simulator import OracleSimulator
    from mongo_bulk_data_migration_spark.sources.fixtures import (
        CHANGES_SCHEMA,
        SEQUENCES_SCHEMA,
        make_changes,
        make_sequences,
    )

    from conftest import rows_of

    wh = str(tmp_path / "whc")
    cat = Catalog(wh)
    t = cat.create_table("seq", SEQUENCES_SCHEMA, num_buckets=4)
    rows = make_sequences(30)
    t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))
    events = make_changes(30, 80, n_parts=4, n_batches=2)
    ev_dir = str(tmp_path / "events_c")
    spark.createDataFrame(events, CHANGES_SCHEMA).write.parquet(ev_dir)

    cmd = [
        SPARK_SUBMIT, "--master", "local-cluster[2,1,1024]",
        "--conf", "spark.sql.shuffle.partitions=2",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.executor.memory=1g",
        "--py-files", _zip_pkg(tmp_path),
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--warehouse", wh, "--table", "seq", "--migration-id", "subc1",
        "--events", ev_dir, "--events-per-batch", "40",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["batches"] == 2 and out["events"] == 80

    sim = OracleSimulator(rows)
    for b in range(2):
        sim.apply_batch([e for e in events if e["seq"] // 40 == b])
    got = {r["doc_id"]: r for r in rows_of(cat.load_table("seq").read(spark))}
    want = {r["doc_id"]: r for r in sim.rows()}
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["tokens"] == w["tokens"]
