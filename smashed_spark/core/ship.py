"""Ship the smashed_spark package to Spark executors.

Python-tier mappers (jinja, tokenizers, ftfy) serialize closures and
objects that reference this package by module name; Python workers must
be able to import it regardless of the driver's working directory.  On
a real cluster this is the standard wheel / ``--py-files`` deployment;
for local and ad-hoc drivers we zip the package once per session and
register it with ``addPyFile``.  Called automatically by every mapper
whose ``apply`` ships Python to workers.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set = set()


def ensure_shipped(spark) -> None:
    sid = id(spark.sparkContext)
    if sid in _SHIPPED:
        return
    import smashed_spark

    pkg_dir = os.path.dirname(os.path.abspath(smashed_spark.__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "smashed_spark_pyfiles.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "smashed_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(sid)
