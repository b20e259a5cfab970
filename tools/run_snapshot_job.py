"""spark-submit entry for the ported reference jobs — the equivalent of
each Glue job's ``__main__`` (read source → run job → partitioned write
→ commit summary).

    spark-submit --py-files synapse_etl_jobs_spark.zip \
        tools/run_snapshot_job.py \
        --job certified_quiz_snapshots \
        --source /data/raw/certifiedQuizSnapshots \
        --target /warehouse/certified_quiz_snapshots \
        --source-format json

Jobs: any registry name (synapse_etl_jobs_spark/jobs/registry.py) or a
bespoke port (node_snapshots, process_access_record,
user_profile_snapshots, certified_quiz_question_snapshots,
file_download_records). JSON sources read schema-on-read (multiline,
recursive — the reference's S1 scan) with corrupt rows routed to
``<target>/_quarantine`` instead of silently dropped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from synapse_etl_jobs_spark.jobs import (
        JOB_SPECS, certified_quiz_question_snapshots, file_download_records,
        node_snapshots, process_access_records, run_job,
        user_profile_snapshots,
    )
    from synapse_etl_jobs_spark.session import get_spark
    from synapse_etl_jobs_spark.sources.readers import quarantine_split

    bespoke = {
        "node_snapshots": (node_snapshots, "snapshot_date"),
        "process_access_record": (process_access_records, "record_date"),
        "user_profile_snapshots": (user_profile_snapshots, "snapshot_date"),
        "certified_quiz_question_snapshots": (
            certified_quiz_question_snapshots, "snapshot_date"),
        "file_download_records": (file_download_records, "record_date"),
    }

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--job", required=True,
                   help=f"one of {sorted(bespoke) + sorted(JOB_SPECS)}")
    p.add_argument("--source", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--source-format", choices=["json", "parquet"], default="json")
    args = p.parse_args()

    spark = get_spark(app_name=f"job-{args.job}")
    spark.sparkContext.setLogLevel("WARN")

    if args.source_format == "json":
        raw = (
            spark.read.option("multiLine", "true")
            .option("recursiveFileLookup", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(args.source)
        )
        if "_corrupt_record" in raw.columns:
            good, bad = quarantine_split(raw)
            n_bad = bad.count()
            if n_bad:
                bad.write.mode("append").json(
                    os.path.join(args.target, "_quarantine")
                )
        else:
            good, n_bad = raw, 0
    else:
        good, n_bad = spark.read.parquet(args.source), 0

    if args.job in bespoke:
        fn, partition_key = bespoke[args.job]
        out = fn(good)
    elif args.job in JOB_SPECS:
        partition_key = JOB_SPECS[args.job].partition_date_col
        out = run_job(args.job, good)
    else:
        p.error(f"unknown job {args.job!r}")

    t0 = time.time()
    out.write.mode("append").partitionBy(partition_key).parquet(args.target)
    rows = spark.read.parquet(args.target).count()
    print(json.dumps({
        "job": args.job,
        "partition_key": partition_key,
        "quarantined": n_bad,
        "target_rows": rows,
        "write_sec": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()
