"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``tsengine.entry_queries`` — every entry runs
through the engine's real modules (rollup/gapfill/curves/chunks/textops/
vecops/multimodal), with a paired ANSI-SQL oracle built for bit-stable
cross-engine comparison (see that module's parity rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsengine.env_tuning import setdefault_simd  # noqa: E402

# virtualized-AVX numpy workaround; effective for the Spark workers even if
# the importing process already loaded numpy (env_tuning.py)
setdefault_simd()

from tsengine import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's E1 pipeline
    shape (scan → keyed rollup cascade → finalized stats), SURVEY.md §3."""
    return entry_queries.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline operators: dedup, LSH, quality, ANN, multimodal)."""
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return dict(entry_queries.ORACLES)
