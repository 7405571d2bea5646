"""spark-submit entry point: compact and/or transcode a webcodec table.

    spark-submit --py-files webcodec.zip jobs/compact_table.py \
        --table /tables/pages [--target-mb 128] \
        [--rewrite-to /tables/pages_gzip --compression gzip]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--rewrite-to", default=None)
    ap.add_argument("--compression", default="zstd")
    ap.add_argument("--columns", default=None)
    args = ap.parse_args()

    from webcodec.spark.maintenance import compact, rewrite_encoded

    out = {}
    if args.rewrite_to:
        from pyspark.sql import SparkSession

        from webcodec.config import EncoderConfig

        spark = SparkSession.builder.appName("webcodec-rewrite").getOrCreate()
        snap = rewrite_encoded(
            spark,
            args.table,
            args.rewrite_to,
            EncoderConfig(compression=args.compression),
            columns=args.columns.split(",") if args.columns else None,
        )
        out["rewritten"] = {"files": len(snap["files"]), "rows": snap["total_rows"]}
        spark.stop()
    else:
        snap = compact(args.table, target_bytes=args.target_mb << 20)
        out["compacted"] = {
            "files": len(snap["files"]),
            "rows": snap["total_rows"],
            "compressed_bytes": snap["total_compressed_bytes"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
