"""Package shipping for executors.

Module-level pandas UDFs are pickled by reference, so executor Python
workers must be able to import ``entity_resolution_spark``. On a real
cluster that's ``spark-submit --py-files ers.zip``; this module builds
that zip and can also ship it into a live session via addPyFile (the
north_rule's "ships as a spark-submit --py-files package").
"""

from __future__ import annotations

import os
import zipfile

import entity_resolution_spark


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the package for spark-submit --py-files / addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(entity_resolution_spark.__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def ship_package(spark) -> str:
    """Make the package importable on executors of a live session."""
    import tempfile

    zip_path = os.path.join(tempfile.mkdtemp(prefix="ers_pyfiles_"), "entity_resolution_spark.zip")
    build_pyfiles_zip(zip_path)
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
