"""Make ``job_etl_spark`` importable on executor Python workers.

Query functions that cross the Python boundary with *module-level*
functions (``lifedata._q159_hash``) or closures referencing module-level
helpers (``ml.codecs.perceptual_hash``) are pickled **by reference**:
the worker must ``import job_etl_spark`` to unpickle them. That works
whenever the driver's cwd is the repo root (pyspark workers put the cwd
on ``sys.path``) — i.e. in every test/bench invocation — but a driver
launched from elsewhere with only a driver-side ``sys.path`` tweak (the
``__spark_entry__`` contract) gets ``ModuleNotFoundError`` from the
worker. ``ensure_worker_package`` closes that hole the standard way:
zip the package once per process and ``addPyFile`` it once per
SparkContext. Cost: one ~0.5 MB zip + upload per session — negligible,
and it is the correct distribution mechanism on a real cluster too.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(tempfile.gettempdir(), f"job_etl_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for dirpath, dirnames, filenames in os.walk(pkg_dir):
                dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                for fn in sorted(filenames):
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, root))
        os.replace(tmp, out)
    return out


def ensure_worker_package(spark) -> None:
    """Idempotent per-SparkContext: ship the package to Python workers."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(key)
