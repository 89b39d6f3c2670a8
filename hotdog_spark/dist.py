"""Ship the hotdog_spark package to executor Python workers.

Python UDFs (the exact-merge path, text/similarity pandas UDFs) are
cloudpickled *by reference* to their defining module, so executor-side
Python workers must be able to import ``hotdog_spark`` — which is not a
given when the driver process merely put the repo dir on its own
``sys.path`` (exactly how the correctness driver imports
``__spark_entry__``).  ``ensure_shipped`` zips the package once per
SparkContext and registers it with ``addPyFile``; workers then import it
from the shipped zip.  On a real cluster this is the same mechanism used
to distribute the engine to 1000 executors.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    staging = tempfile.mkdtemp(prefix="hotdog_spark_dist_")
    zip_path = shutil.make_archive(
        os.path.join(staging, "hotdog_spark"), "zip", repo_root, "hotdog_spark"
    )
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
