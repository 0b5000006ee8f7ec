"""spark-submit entry point: tombstone documents of a written index.

    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_delete.py --index <runs or positional index dir> \
        --input <parquet with a doc_id column>
    spark-submit ... tools/submit_delete.py --index <idx> --ids 3 17 99

Deletes are LAZY (Lucene-style): the tombstoned doc ids land in the
<index>/tombstones sidecar through the same atomic staged + lineage
protocol as the appends (re-run after a crash to complete the batch);
every query path drops them BEFORE its top-k cut from that moment on.
The physical purge happens at the next compaction
(tools/submit_compact.py runs|positional), which re-encodes the postings
without the deleted docs, shrinks doc_stats/docs, and clears the
sidecar. Ids not in the index or already tombstoned are ignored
(idempotent). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--input", default=None,
                    help="parquet path with a doc_id column")
    ap.add_argument("--ids", type=int, nargs="*", default=None,
                    help="explicit doc ids (small takedown lists)")
    args = ap.parse_args()
    if not args.input and not args.ids:
        ap.error("pass --input or --ids")

    from pyspark.sql import SparkSession

    from cer_for_mti_spark.operators import index_build as ib

    spark = SparkSession.builder.appName("cer_index_delete").getOrCreate()
    if args.input:
        ids = spark.read.parquet(args.input).select("doc_id")
    else:
        ids = spark.createDataFrame([(i,) for i in args.ids],
                                    "doc_id long")
    t0 = time.time()
    n = ib.delete_docs(spark, args.index, ids)
    total = ib.read_tombstones(spark, args.index).count()
    print(json.dumps({
        "tombstoned_now": int(n),
        "tombstoned_total": int(total),
        "elapsed_sec": round(time.time() - t0, 3),
        "index": args.index,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
