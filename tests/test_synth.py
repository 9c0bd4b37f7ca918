from __future__ import annotations

import pyspark.sql.functions as F

from tsengine.synth import generate_transcripts


def test_schema_and_invariants(spark, transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    # turn_idx dense 0..n-1 and ts strictly increasing per conv
    bad = transcripts.groupBy("conv_id").agg(
        (F.max("turn_idx") + 1 - F.count("*")).alias("gap"),
        (F.count("ts") - F.count_distinct("ts")).alias("dup_ts"),
    ).where((F.col("gap") != 0) | (F.col("dup_ts") != 0))
    assert bad.count() == 0


def test_determinism_and_skew(spark, transcripts):
    again = generate_transcripts(spark, n_convs=60, seed=42, mega_turns=2000,
                                 partitions=3)  # different partitioning
    assert transcripts.exceptAll(again).count() == 0
    assert again.exceptAll(transcripts).count() == 0
    sizes = transcripts.groupBy("conv_id").count()
    mx = sizes.agg(F.max("count")).first()[0]
    med = sizes.agg(F.expr("percentile(count, 0.5)")).first()[0]
    assert mx == 2000 and mx > 20 * med  # heavy tail present


def test_tool_and_roles(transcripts):
    roles = {r["role"] for r in transcripts.select("role").distinct().collect()}
    assert roles <= {"user", "assistant", "system", "tool"}
    with_tool = transcripts.where(F.col("tool").isNotNull()).count()
    assert with_tool > 0
