"""Default engine settings — the base layer every ``ConfigLoader``
starts from (parity with ``/root/reference/nexus/settings.py``).

A user settings.py (found via ``EVENT_PIPELINE_SPARK_CONFIG`` /
``EVENT_PIPELINE_SPARK_CONFIG_DIR``, see ``conf.py``) overrides any of
these by defining the same UPPERCASE name. Keys whose default is
``None`` fall through to the process environment, which is how the
``SPARK_GRAFT_*`` knobs have always been set — the loader makes them
one documented surface without changing their env-var behavior.
"""

from __future__ import annotations

# -- retry / execution (reference settings.py: MAX_EVENT_*) -----------------
MAX_EVENT_RETRIES = 5
MAX_EVENT_BACKOFF_FACTOR = 0.05
MAX_EVENT_BACKOFF = 100.0

# -- batch processing -------------------------------------------------------
MAX_BATCH_PROCESSING_WORKERS = 4

# -- engine knobs (None → resolved from the environment at get() time) ------
#: executor-thread count for local[...] masters (int-like string)
SPARK_GRAFT_CPUS = None
#: driver JVM heap, e.g. "8g"
SPARK_GRAFT_DRIVER_MEM = None
#: parquet table directory for bench / entry points
SPARK_GRAFT_SF_DIR = None
#: timed executions per bench query (bench.py; default 3 there)
SPARK_GRAFT_BENCH_RUNS = None
#: comma-separated bench query override (bench.py)
SPARK_GRAFT_BENCH_QUERIES = None
#: "0" disables the bench 10x scale section (bench.py)
SPARK_GRAFT_BENCH_SCALE = None
#: multiplier for the bench scale section (bench.py; default 10 there)
SPARK_GRAFT_BENCH_SCALE_MULT = None
