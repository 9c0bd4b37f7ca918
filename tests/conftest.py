from __future__ import annotations

from tsengine.env_tuning import setdefault_simd

# before ANY numpy import: virtualized-AVX workaround (see env_tuning.py)
setdefault_simd()

import pytest  # noqa: E402

from tsengine.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tsengine-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from tsengine.synth import generate_transcripts

    # small but structured: 60 convs incl. one forced mega-conv (2k turns)
    df = generate_transcripts(spark, n_convs=60, seed=42, mega_turns=2000)
    df = df.cache()
    df.count()
    return df
