"""Checkpoint/resume (SURVEY §5 item 5): kill mid-job, rerun, assert zero
recomputed units and identical output."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tsengine import jobs
from tsengine.jobs import PipelineFailure
from tsengine.lineage import LineageLog
from tsengine.synth import generate_transcripts


def test_resume_skips_completed_units(spark, tmp_path):
    out = str(tmp_path / "pipe")
    tr = generate_transcripts(spark, n_convs=24, seed=7, mega_turns=500).cache()
    tr.count()

    # first run dies after 3 units
    with pytest.raises(PipelineFailure):
        jobs.run_pipeline(spark, tr, out, n_buckets=4, fingerprint="fp1",
                          fail_after_units=3)
    log = LineageLog(spark, out)
    done_before = log.metrics().where("status = 'done'").count()
    assert done_before == 3

    # resume completes the remaining units only
    paths = jobs.run_pipeline(spark, tr, out, n_buckets=4, fingerprint="fp1")
    m = log.metrics().toPandas()
    assert len(m) == 8  # 4 buckets × 2 stages, nothing recomputed
    assert (m["status"] == "done").all()

    # output equals a clean single-shot run
    out2 = str(tmp_path / "clean")
    paths2 = jobs.run_pipeline(spark, tr, out2, n_buckets=4, fingerprint="fp1")
    for t in ("1m", "1h", "1d"):
        a = spark.read.parquet(paths[t])
        b = spark.read.parquet(paths2[t])
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # rerunning the finished job recomputes nothing
    jobs.run_pipeline(spark, tr, out, n_buckets=4, fingerprint="fp1")
    assert log.metrics().count() == 8


def test_fingerprint_invalidates(spark, tmp_path):
    out = str(tmp_path / "pipe")
    tr = generate_transcripts(spark, n_convs=8, seed=7, mega_turns=100).cache()
    jobs.run_pipeline(spark, tr, out, n_buckets=2, fingerprint="fpA")
    log = LineageLog(spark, out)
    assert log.metrics().count() == 4
    # changed input fingerprint → all units recompute
    jobs.run_pipeline(spark, tr, out, n_buckets=2, fingerprint="fpB")
    assert log.metrics().count() == 8
    assert log.completed_units("pipeline", "chunks", "fpB") == {"bucket=0", "bucket=1"}
