"""spark-submit entry point: decode a webcodec table (optionally verify
against a source parquet table).

    spark-submit --py-files webcodec.zip jobs/decode_table.py \
        --table /tmp/wc_documents [--verify-against src.parquet] [--out dir]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow plain `python jobs/<job>.py` too (spark-submit ships the zip)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="webcodec table dir")
    ap.add_argument("--columns", default=None, help="comma-separated projection")
    ap.add_argument("--predicate", default=None,
                    help='JSON conjunct list, e.g. \'[["lang","==","en"],["n","<",5]]\'')
    ap.add_argument("--snapshot-id", type=int, default=None, help="time travel")
    ap.add_argument("--out", default=None, help="write decoded rows as parquet here")
    ap.add_argument("--encryption-key-hex", default=None,
                    help="AES key (hex) for C12-encrypted tables")
    ap.add_argument("--verify-against", default=None, help="source parquet to compare")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from webcodec.spark.decode_job import read_encoded, verify_roundtrip

    spark = SparkSession.builder.appName("webcodec-decode").getOrCreate()
    cols = args.columns.split(",") if args.columns else None
    pred = None
    if args.predicate:
        pred = [tuple(term) for term in json.loads(args.predicate)]
    t0 = time.time()
    ekey = bytes.fromhex(args.encryption_key_hex) if args.encryption_key_hex else None
    df = read_encoded(spark, args.table, columns=cols, predicate=pred,
                      encryption_key=ekey,
                      snapshot_id=args.snapshot_id)
    result: dict = {}
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        result["written"] = args.out
    if args.verify_against:
        src = spark.read.parquet(args.verify_against)
        if cols:
            src = src.select(cols)
        result["verify"] = verify_roundtrip(spark, src, args.table, [])
    else:
        result["rows"] = df.count()
    result["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
