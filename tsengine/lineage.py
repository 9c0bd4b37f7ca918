"""Per-partition lineage + metrics; checkpoint/resume (SURVEY §2.1 S7).

Generalizes the reference's idempotent skip-if-exists re-run guard
(`src/rewemo/era5.py:80-82,99-101,136-137`) into a table-backed scheduler:

- work is split into deterministic UNITS — ``bucket k = hash(conv_id) % B``
  (the same bucketing a production Iceberg table would declare as its
  partition transform ``bucket(B, conv_id)``);
- each completed (stage, unit) appends a lineage row with row counts, wall
  time and an input fingerprint;
- on re-run, units already ``done`` for the same job/stage/fingerprint are
  skipped BEFORE any compute is launched — resume costs one small parquet
  read, zero recompute (resume-tested in tests/test_lineage.py).

Sinks are parquet directories with one subdirectory per unit
(``unit=<k>/``), written atomically per unit — a unit is either fully
present + recorded, or absent. With an Iceberg catalog the same layer maps
onto snapshot IDs + ``overwritePartitions``; the unit scheduler is
catalog-agnostic by design since this sandbox ships no Iceberg runtime.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.schema import LINEAGE


class LineageLog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, "_lineage")

    def completed_units(self, job_id: str, stage: str, fingerprint: str | None) -> set[str]:
        if not os.path.isdir(self.path):
            return set()
        df = self.spark.read.schema(LINEAGE).parquet(self.path)
        rows = (
            df.where(
                (F.col("job_id") == job_id)
                & (F.col("stage") == stage)
                & (F.col("status") == "done")
                & (
                    F.col("input_fingerprint").eqNullSafe(fingerprint)
                )
            )
            .select("unit")
            .distinct()
            .collect()
        )
        return {r["unit"] for r in rows}

    def record(
        self,
        job_id: str,
        stage: str,
        unit: str,
        *,
        fingerprint: str | None = None,
        rows_in: int | None = None,
        rows_out: int | None = None,
        wall_ms: int | None = None,
        status: str = "done",
    ) -> None:
        pdf = pd.DataFrame(
            [
                {
                    "job_id": job_id,
                    "stage": stage,
                    "unit": unit,
                    "input_fingerprint": fingerprint,
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "wall_ms": wall_ms,
                    "status": status,
                    "finished_at": datetime.now(timezone.utc).replace(tzinfo=None),
                }
            ]
        )
        self.spark.createDataFrame(pdf, schema=LINEAGE).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def metrics(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE).parquet(self.path)

    def record_metrics(
        self, job_id: str, stage: str, values: dict | DataFrame
    ) -> None:
        """Persist named counters as first-class ``status='metric'`` rows
        (unit = counter name, rows_out = value) — the sink for the
        engine's "caps are never silent" rule: a long-running dedup job
        records its `bucket_cap` dropped-bucket/row counts here, so
        recall loss shows up in ``metrics()`` next to throughput instead
        of dying with the driver log.

        ``values`` is either the dict an ``Observation.get`` yields or a
        1-row metrics DataFrame (e.g. `textops.bucket_cap`'s fallback) —
        the latter is collected (it is a single aggregate row by
        construction)."""
        if isinstance(values, DataFrame):
            row = values.collect()[0]
            values = row.asDict()
        for name, val in values.items():
            self.record(
                job_id,
                stage,
                f"metric:{name}",
                rows_out=int(val) if val is not None else None,
                status="metric",
            )


def run_unit(
    log: LineageLog,
    job_id: str,
    stage: str,
    unit: str,
    fingerprint: str | None,
    fn,
) -> bool:
    """Execute ``fn() -> (rows_in, rows_out)`` for one work unit unless the
    lineage log already marks it done. Returns True if executed."""
    t0 = time.monotonic()
    rows_in, rows_out = fn()
    log.record(
        job_id,
        stage,
        unit,
        fingerprint=fingerprint,
        rows_in=rows_in,
        rows_out=rows_out,
        wall_ms=int((time.monotonic() - t0) * 1000),
    )
    return True
