"""Environment workaround: numpy SIMD dispatch vs virtualized CPUs.

Some sandboxed/virtualized hosts (observed on this Firecracker guest)
advertise AVX/AVX2/AVX-512 in CPUID but trap-and-emulate the instructions,
making numpy's vectorized kernels 100-700× SLOWER than its SSE paths
(measured: np.cumsum over 2.5M int64 = 2.1 s with AVX dispatch, 9 ms with
SSE). Pure-Python code is unaffected, so the pathology only shows up in
exactly the code that should be fastest — Arrow/pandas UDFs and codecs.

``NPY_DISABLE_CPU_FEATURES`` must be set BEFORE numpy is first imported in
a process. Two surfaces:

- driver / test / bench processes: entry points call ``setdefault_simd()``
  at the very top, before importing anything numpy-flavored;
- Spark python workers: ``configure_spark_env()`` injects the variable into
  the worker environment (inherited through the JVM), so every pandas-UDF
  worker gets fast numpy regardless of who launched the driver.

On healthy hardware the microbenchmark passes and nothing is disabled —
real clusters keep their AVX.
"""

from __future__ import annotations

import os
import subprocess
import sys

# AVX tiers only — SSE4.2 and below run at full speed under the trap.
PATHOLOGICAL_FEATURES = (
    "AVX512F AVX512CD AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL "
    "AVX2 FMA3 F16C AVX"
)

_ENV = "NPY_DISABLE_CPU_FEATURES"
_PROBE = (
    "import time,numpy as np;a=np.arange(2_000_000,dtype=np.int64);"
    "t=time.time();[np.cumsum(a) for _ in range(3)];"
    "print('SLOW' if time.time()-t>0.3 else 'OK')"
)


def simd_is_pathological() -> bool:
    """Probe in a clean subprocess (the current process may already have
    numpy imported, whose dispatch can't be changed)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=60,
            env={k: v for k, v in os.environ.items() if k != _ENV},
        )
        return "SLOW" in out.stdout
    except Exception:
        return False


def setdefault_simd(force: bool | None = None) -> bool:
    """Set the disable list in os.environ (for this process — effective
    only if numpy is not yet imported — and all children). Returns True if
    the workaround is active."""
    if _ENV in os.environ:
        return bool(os.environ[_ENV])
    active = force if force is not None else simd_is_pathological()
    if active:
        os.environ[_ENV] = PATHOLOGICAL_FEATURES
    return active
