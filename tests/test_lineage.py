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


def test_cap_metrics_recorded_as_lineage_rows(spark, tmp_path):
    # VERDICT r3 item 8: a dedup job's recall-loss counters become
    # first-class status='metric' rows in the lineage table
    from pyspark.sql import Observation

    from tsengine import textops

    # one overfull cluster (dropped by the cap, feeds the metrics) plus
    # one under-cap cluster (keeps the result non-empty, so AQE cannot
    # collapse the observed branch — the documented degenerate case)
    docs = spark.createDataFrame(
        [(i, "the same text body repeated " * 3) for i in range(10)]
        + [(100 + i, "a completely different story here " * 3) for i in range(3)],
        "doc_id long, text string",
    )
    sim = textops.simhash(docs, bits=16)
    obs = Observation("cap")
    pairs = textops.hamming_neighbors(
        sim, max_dist=1, bits=16, max_bucket=4, observation=obs
    )
    n_pairs = pairs.count()  # one action drives both result and metrics
    log = LineageLog(spark, str(tmp_path / "dedup"))
    log.record_metrics("dedupjob", "hamming_neighbors", obs.get)

    m = log.metrics().where("status = 'metric'")
    got = {r["unit"]: r["rows_out"] for r in m.collect()}
    assert set(got) == {"metric:n_buckets_dropped", "metric:n_rows_dropped"}
    # the 10-doc cluster overflows cap 4 -> real drops recorded
    assert got["metric:n_rows_dropped"] > 0
    # cap bit: only the 3-doc cluster pairs survive, not the C(10,2) clique
    assert 0 < n_pairs < 45

    # metric rows must NOT confuse the resume scheduler
    assert log.completed_units("dedupjob", "hamming_neighbors", None) == set()

    # DataFrame fallback path (bucket_cap's dropped metrics frame)
    sim2 = textops.simhash(docs, bits=16)
    kept, dropped = textops.hamming_neighbors(
        sim2, max_dist=1, bits=16, max_bucket=4, return_dropped=True
    )
    log.record_metrics("dedupjob2", "hamming_neighbors", dropped)
    m2 = log.metrics().where(
        "status = 'metric' AND job_id = 'dedupjob2'"
    )
    assert m2.count() == 2


def test_run_compaction_resumes_and_conserves_points(spark, transcripts, tmp_path):
    from pyspark.sql import functions as F

    from tsengine import chunks, jobs

    out = str(tmp_path / "job")
    jobs.run_pipeline(spark, transcripts.where(F.col("conv_id") < "conv-00000012"), out)
    dst = jobs.run_compaction(spark, out, to_span="7d")
    src_pts = spark.read.parquet(f"{out}/chunks").agg(F.sum("n")).first()[0]
    dst_df = spark.read.parquet(dst)
    assert dst_df.agg(F.sum("n")).first()[0] == src_pts
    # decoded output identical through the compaction generation
    a = chunks.decode_chunks(spark.read.parquet(f"{out}/chunks")).count()
    assert chunks.decode_chunks(dst_df).count() == a
    # re-run: every unit already done -> zero new lineage rows
    log = LineageLog(spark, out)
    before = log.metrics().where("status = 'done'").count()
    jobs.run_compaction(spark, out, to_span="7d")
    after = log.metrics().where("status = 'done'").count()
    assert after == before
