"""Ship this package to executor Python workers.

Anything that cloudpickles references to module-level code — the
Arrow-UDF rows, and the Python DataSource connector (sources/pyds.py),
whose DataSource class is pickled into the worker that plans and reads
partitions — requires `nomba_data_pipeline_spark` to be importable on
the workers regardless of the driver process's cwd/PYTHONPATH.
`ship_package` zips the package once per process and addPyFile's it
(idempotent per SparkContext); `__spark_entry__` and
`sources.pyds.register` both route through here.
"""

from __future__ import annotations

import os
import zipfile

_PKG_ZIP: str | None = None
_SHIP_WARNED: bool = False


def ship_package(spark) -> None:
    global _PKG_ZIP, _SHIP_WARNED
    if _PKG_ZIP is None:
        import tempfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        repo = os.path.dirname(pkg_dir)
        # per-process name: two concurrent harness processes sharing a
        # fixed path could read each other's half-written zip
        zpath = os.path.join(
            tempfile.gettempdir(),
            f"nomba_data_pipeline_spark_pkg_{os.getpid()}.zip",
        )
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, repo))
        _PKG_ZIP = zpath
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception as e:  # e.g. Connect-only session, stopped context
        # log the cause once so a real failure (zip unreadable, dead
        # context) doesn't surface later as an opaque worker ImportError
        if not _SHIP_WARNED:
            _SHIP_WARNED = True
            import sys

            print(
                f"ship_package: addPyFile({_PKG_ZIP}) failed "
                f"({type(e).__name__}: {e}); workers fall back to the "
                "environment's PYTHONPATH",
                file=sys.stderr,
            )
