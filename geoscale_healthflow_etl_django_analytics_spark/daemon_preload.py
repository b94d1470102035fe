"""Python worker daemon with the heavy libraries PRE-IMPORTED.

Spark's Python workers are forked from a per-executor daemon process
(``spark.python.use.daemon``, the Unix default).  The stock daemon
(``pyspark.daemon``) has only pyspark itself imported when it forks,
so every fresh worker pays the pandas + pyarrow + numpy import chain
(~0.3-0.6 s each here) before its first Arrow batch — and the idle
worker pool is WEAKLY referenced in the JVM (PythonWorkerFactory), so
any full GC can reap it, after which the next mapInPandas stage
re-pays one import chain PER TASK SLOT.  Round 12 measured a single
hot mapInPandas pass at 0.8 s with the pool intact vs 8+ s after a GC
tick wiped it; the same effect put multi-second noise on every
mm_* bench reading.

This module is dropped in via ``spark.python.daemon.module`` (the
standard extension point — guide §4.5: initialise heavyweight state
once and amortise it).  Imports run ONCE per daemon (per executor);
forked workers inherit the loaded modules copy-on-write, so refilling
a cold pool costs a fork, not an import chain per worker.  The
try/except keeps the daemon usable on an executor image without the
scientific stack — workers there simply pay the import as before.

The worker protocol itself is untouched: ``manager()`` is the stock
pyspark daemon loop.
"""

try:  # pre-import before the first fork; workers inherit via COW
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover - trimmed-down executor images
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
