"""Packaging evidence (BASELINE.json:6 "ships as a spark-submit
--py-files package"): run the flagship tile job through a REAL
``spark-submit --py-files engine.zip`` on a 2-executor
``local-cluster`` — where the engine code reaches executors ONLY via
the zip — and require the portable tile-table checksum to equal an
in-process (sys.path) run. Bit-identical output through the shipped
package is the north rule's packaging clause, evidenced end-to-end.

Usage: python tools/verify_submit.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

JOB = """
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
# the package must come from --py-files, NOT the repo working dir
from osm_data_classification_spark.jobs_api import flagship
from osm_data_classification_spark.io import table_checksum

df = flagship(spark, sys.argv[1]).drop("activity_hist")
print("TILE_CHECKSUM", table_checksum(df), df.count(), flush=True)
spark.stop()
"""


def main() -> None:
    zip_path = os.path.join(ROOT, "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package.py"), zip_path],
        check=True,
    )
    # tempfile, not a file in tools/: a failed spark-submit (check=True
    # raises) must not strand a generated job file in the source tree
    # (r3 ADVICE)
    import tempfile

    fd, job_path = tempfile.mkstemp(prefix="submit_job_", suffix=".py")
    with os.fdopen(fd, "w") as f:
        f.write(JOB)

    from pyspark import find_spark_home

    spark_submit = os.path.join(
        find_spark_home._find_spark_home(), "bin", "spark-submit"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only code source
    try:
        out = subprocess.run(
            [
                spark_submit,
                "--master", "local-cluster[2,2,4096]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zip_path,
                job_path, SF_DIR,
            ],
            check=True, capture_output=True, text=True, env=env, cwd="/tmp",
        )
    finally:
        os.remove(job_path)
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith("TILE_CHECKSUM")
    )
    _, submitted_sum, submitted_rows = line.split()

    sys.path.insert(0, ROOT)
    from osm_data_classification_spark.io import table_checksum
    from osm_data_classification_spark.jobs_api import flagship
    from osm_data_classification_spark.session import get_spark

    spark = get_spark("verify-submit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    df = flagship(spark, SF_DIR).drop("activity_hist")
    local_sum, local_rows = table_checksum(df), df.count()

    ok = (int(submitted_sum), int(submitted_rows)) == (local_sum, local_rows)
    print(
        f"spark-submit --py-files: checksum {submitted_sum} rows {submitted_rows} "
        f"| in-process: checksum {local_sum} rows {local_rows} | "
        f"{'IDENTICAL' if ok else 'MISMATCH'}"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
