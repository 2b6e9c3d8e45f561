"""Shared job bootstrap: make kmertools_spark importable on the driver
AND on executor python workers.

On a real cluster the zip arrives via ``spark-submit --py-files`` and
this module is a no-op. Run standalone (``python jobs/<job>.py``), the
driver gets the repo root on sys.path and ``ensure_executors`` ships
the packaged zip with addPyFile (executor workers never see the
driver's sys.path), building it with jobs/package.py when absent.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import kmertools_spark  # noqa: F401

    NEED_PYFILES = False
except ImportError:
    sys.path.insert(0, _REPO)  # driver side
    NEED_PYFILES = True


def ensure_executors(spark) -> None:
    """Ship the packaged zip to executors when not already importable."""
    if not NEED_PYFILES:
        return
    zipp = os.path.join(_REPO, "dist", "kmertools_spark.zip")
    if not os.path.exists(zipp):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(_REPO, "jobs", "package.py")],
            check=True,
        )
    spark.sparkContext.addPyFile(zipp)
