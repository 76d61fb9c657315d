"""Ship the package to Python UDF workers.

The driver harness imports this package via ``sys.path`` manipulation,
which executor-side Python workers do not inherit — a pandas UDF that
references module-level functions then dies with ModuleNotFoundError.
``ensure_worker_imports`` zips the package and ``addPyFile``s it once per
SparkContext, which is also exactly what a real cluster deployment needs
(``spark-submit --py-files``)."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    sc = spark.sparkContext
    app_id = sc.applicationId or "local"
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"sortify_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app_id)
