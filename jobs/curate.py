"""Web-corpus curation job: the round-3 curation funnel as one
spark-submit entry point (the companion of jobs/clean_corpus.py,
which runs the quality+dedup chain).

    spark-submit --py-files engine.zip jobs/curate.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated

Stages (operators/webtext.py `curate_stages`, identical to the
driver-graded `curate_corpus_funnel` oracle entry): canonical-URL
dedup → length gate → repetition gate → benchmark-member removal →
decontamination → stratified sample. The job then PII-scrubs the
surviving text and writes:

- ``data/``    the curated corpus (doc_id, lang, scrubbed text)
- ``funnel/``  the (stage, rows) funnel report
- ``_lineage`` per-partition lineage rows for exact resume (io.py)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_data_classification_spark.jobs_api import run_curate  # noqa: E402
from osm_data_classification_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--out", default="/tmp/curated")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("curate", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()

    n_docs, checksum = run_curate(spark, args.sf_dir, args.out)
    for r in (
        spark.read.parquet(os.path.join(args.out, "funnel"))
        .orderBy("stage")
        .collect()
    ):
        print(f"{r['stage']:>22}: {r['rows']}")
    print(
        f"curated {n_docs} docs (checksum {checksum}) in "
        f"{time.perf_counter() - t0:.1f}s -> {args.out}"
    )


if __name__ == "__main__":
    main()
