"""Catalog registry (S3 parity), SQL INSERT (S11 parity), and the
node-snapshots job port (drift tolerance + syn-id normalization)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StructType

from synapse_etl_jobs_spark.catalog import Catalog
from synapse_etl_jobs_spark.jobs import node_snapshots
from synapse_etl_jobs_spark.lake import LakeTable


def _hive_schema():
    return (
        StructType()
        .add("id", "long").add("v", "string").add("month", "string")
    )


def test_catalog_parquet_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.parquet(p)
    cat = Catalog(spark)
    cat.register_parquet("t", p)
    got = cat.table("t", push_down_predicate="id >= 90 AND v % 4 = 0")
    assert got.count() == 5
    with pytest.raises(KeyError):
        cat.table("nope")


def test_catalog_hive_partition_types_not_inferred(spark, tmp_path):
    """Zero-padded month partition values must stay strings ('03'), not
    be inferred as integers — the registered schema wins."""
    p = str(tmp_path / "h")
    cat = Catalog(spark)
    cat.register_hive("h", p, _hive_schema(), ["month"])
    # empty before any insert
    assert cat.table("h").count() == 0
    df = spark.createDataFrame(
        [(1, "a", "03"), (2, "b", "03"), (3, "c", "11")],
        "id long, v string, month string",
    )
    df.createOrReplaceTempView("src")
    n = cat.insert_into("h", "SELECT id, v, month FROM src")
    assert n == 3
    back = cat.table("h")
    assert dict(back.dtypes)["month"] == "string"
    assert sorted(r["month"] for r in back.select("month").distinct().collect()) \
        == ["03", "11"]
    # partition pruning predicate works on the string value
    assert cat.table("h", push_down_predicate="month = '03'").count() == 2
    # appends accumulate; column-name matching is positional-free
    n2 = cat.insert_into("h", "SELECT month, v, id FROM src WHERE id = 1")
    assert n2 == 1 and cat.table("h").count() == 4


def test_catalog_insert_validates(spark, tmp_path):
    cat = Catalog(spark)
    cat.register_hive("h2", str(tmp_path / "h2"), _hive_schema(), ["month"])
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .createOrReplaceTempView("src2")
    with pytest.raises(ValueError, match="missing columns"):
        cat.insert_into("h2", "SELECT id, v FROM src2")
    cat.register_parquet("notahive", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="hive-partitioned"):
        cat.insert_into("notahive", "SELECT 1")


def test_catalog_lake_read(spark, tmp_path):
    schema = StructType().add("k", "long").add("v", "string")
    t = LakeTable.create(spark, str(tmp_path / "lk"), schema, ["k"], num_buckets=2)
    t.merge(spark.createDataFrame(
        [("UPSERT", 1, 10, "x"), ("UPSERT", 2, 10, "y"), ("UPSERT", 3, 20, "z")],
        "op string, seq long, k long, v string",
    ), batch_id=0)
    cat = Catalog(spark)
    cat.register_lake("lk", str(tmp_path / "lk"))
    got = {(r["k"], r["v"]) for r in cat.table("lk").collect()}
    assert got == {(10, "y"), (20, "z")}
    assert cat.table("lk", push_down_predicate="k = 20").count() == 1


def _envelope(spark, rows):
    """Minimal nested node-change envelope for job tests."""
    return spark.createDataFrame(
        rows,
        "changeType string, changeTimestamp long, userId long, "
        "snapshotTimestamp long, snapshot struct<id:string, "
        "benefactorId:string, nodeType:string, createdOn:long, "
        "versionNumber:long, name:string>",
    )


def test_node_snapshots_job_core_semantics(spark):
    ms = 1_700_000_000_000  # 2023-11-14 UTC
    df = _envelope(spark, [
        ("CREATE", ms, 7, ms,
         ("syn123.4", "syn0008", "file", ms, 1, "n1")),
        ("DELETE", ms, None, ms + 86_400_000,
         (None, "garbage", "folder", ms, 2, "n2")),
    ])
    out = node_snapshots(df)
    rows = {r["name"]: r for r in out.collect()}
    # syn-id normalization: prefix + version suffix stripped; garbage → null
    assert rows["n1"]["id"] == 123 and rows["n1"]["benefactor_id"] == 8
    assert rows["n2"]["id"] is None and rows["n2"]["benefactor_id"] is None
    # dual mapping: timestamp column AND partition date from the same source
    assert rows["n1"]["snapshot_date"] == "2023-11-14"
    assert rows["n2"]["snapshot_date"] == "2023-11-15"
    assert str(rows["n1"]["snapshot_timestamp"]).startswith("2023-11-14")
    # the full mapped schema materializes even though the input snapshot
    # struct carried only 6 fields (drift tolerance: typed nulls)
    from synapse_etl_jobs_spark.jobs import NODE_SNAPSHOTS_MAPPING
    assert len(out.columns) == len(NODE_SNAPSHOTS_MAPPING) == 36
    assert rows["n1"]["is_public"] is None
    assert rows["n1"]["project_id"] is None  # missing nested field → null long
    assert dict(out.dtypes)["created_on"] == "timestamp"


def test_process_access_record_job(spark):
    from synapse_etl_jobs_spark.jobs import (
        PROCESS_ACCESS_RECORD_MAPPING, process_access_records,
    )
    ms = 1_700_000_000_000
    df = spark.createDataFrame(
        [
            ((ms, 7, "GET", "/repo/v1/entity/syn123/wiki/4",
              "Synapse-Java-Client/512.1", "000000042"),),
            ((ms, 8, "POST", "https://x.org/no-version-here",
              "curl/7.68", "000000000"),),
        ],
        "payload struct<timestamp:long, userId:long, method:string, "
        "requestURL:string, userAgent:string, instance:string>",
    )
    out = process_access_records(df)
    rows = {r["user_id"]: r for r in out.collect()}
    r7, r8 = rows[7], rows[8]
    assert r7["normalized_method_signature"] == "GET /entity/#/wiki/#"
    assert r7["client"] == "JAVA" and r7["client_version"] == "512.1"
    assert r7["entity_id"] == 123
    assert r7["record_date"] == "2023-11-14"
    assert r7["instance"] == "42"
    assert r8["normalized_method_signature"] == "POST INVALID URL"
    assert r8["client"] == "UNKNOWN" and r8["client_version"] is None
    assert r8["entity_id"] is None
    assert r8["instance"] == ""  # all-zero instance strips to empty (reference lstrip)
    # drift: the 17 unmapped payload fields become typed null columns
    assert len(out.columns) == len(PROCESS_ACCESS_RECORD_MAPPING) + 4
    assert r7["session_id"] is None and r7["response_status"] is None


def test_user_profile_job_first_email(spark):
    from synapse_etl_jobs_spark.jobs import user_profile_snapshots
    ms = 1_700_000_000_000
    df = spark.createDataFrame(
        [
            (ms, "CREATE", 1, ms, ("8", "u8", ["a@x.org", "b@x.org"])),
            (ms, "CREATE", 2, ms, ("9", "u9", [])),
        ],
        "changeTimestamp long, changeType string, userId long, "
        "snapshotTimestamp long, snapshot struct<ownerId:string, "
        "userName:string, emails:array<string>>",
    )
    out = user_profile_snapshots(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[8]["email"] == "a@x.org"
    assert rows[9]["email"] is None  # empty list → null, no crash
    assert "emails" not in out.columns  # array dropped after selection
    assert rows[8]["snapshot_date"] == "2023-11-14"


def test_quiz_question_job_created_on_drift(spark):
    """Batches predating the createdOn field entirely must fall back to
    the deprecated passedOn — the reference's PLFM-8788 default."""
    from synapse_etl_jobs_spark.jobs import certified_quiz_question_snapshots
    ms = 1_700_000_000_000
    old = spark.createDataFrame(
        [(ms, "CREATE", ms, "prod", "1",
          ("7", 42, [((0,), True), ((1,), False)], ms - 5000))],
        "changeTimestamp long, changeType string, snapshotTimestamp long, "
        "stack string, instance string, snapshot struct<userId:string, "
        "responseId:int, corrections:array<struct<"
        "question:struct<questionIndex:int>, isCorrect:boolean>>, "
        "passedOn:long>",  # no createdOn field at all
    )
    out = certified_quiz_question_snapshots(old).collect()
    assert len(out) == 2  # one row per correction
    assert {(r["question_index"], r["is_correct"]) for r in out} \
        == {(0, True), (1, False)}
    assert all(str(r["created_on"]).startswith("2023-11-14") for r in out)
    assert all(str(r["snapshot_date"]) == "2023-11-14" for r in out)


def test_file_download_job_handle_defaulting(spark):
    """downloaded_file_handle_id defaults to file_handle_id when null
    AND when the field is missing from the batch entirely."""
    from synapse_etl_jobs_spark.jobs import file_download_records
    ms = 1_700_000_000_000
    with_field = spark.createDataFrame(
        [(ms, "prod", "1", (7, "100", None, "syn55")),
         (ms, "prod", "1", (8, "200", "201", "garbage"))],
        "timestamp long, stack string, instance string, payload struct<"
        "userId:long, fileHandleId:string, downloadedFileHandleId:string, "
        "associateId:string>",
    )
    rows = {r["user_id"]: r for r in file_download_records(with_field).collect()}
    assert rows[7]["downloaded_file_handle_id"] == 100  # null → default
    assert rows[8]["downloaded_file_handle_id"] == 201  # present wins
    assert rows[7]["association_object_id"] == 55  # syn strip
    assert rows[8]["association_object_id"] is None  # garbage → null
    without_field = spark.createDataFrame(
        [(ms, (9, "300"))],
        "timestamp long, payload struct<userId:long, fileHandleId:string>",
    )
    r9 = file_download_records(without_field).first()
    assert r9["downloaded_file_handle_id"] == 300  # absent field → default


def test_registry_all_specs_compile_and_tolerate_drift(spark):
    """Every registered template job runs on a minimal envelope that
    carries NONE of its snapshot fields — the full output schema must
    still materialize (typed nulls), with the partition date derived."""
    from synapse_etl_jobs_spark.jobs import JOB_SPECS, run_job
    ms = 1_700_000_000_000
    bare = spark.createDataFrame(
        [(ms, "CREATE", 1, ms, ms, "prod", "1", ("x",))],
        "changeTimestamp long, changeType string, userId long, "
        "snapshotTimestamp long, timestamp long, stack string, "
        "instance string, snapshot struct<_ignore:string>",
    )
    payload_bare = bare.withColumn(
        "payload", F.struct(F.lit("x").alias("_ignore"))
    )
    for name, spec in JOB_SPECS.items():
        src = payload_bare if any(
            m[0].startswith("payload.") for m in spec.mapping
        ) else bare
        out = run_job(name, src)
        assert len(out.columns) == len(spec.mapping), name
        row = out.first()
        assert row[spec.partition_date_col] == "2023-11-14", name


def test_registry_certified_quiz_defaults(spark):
    from synapse_etl_jobs_spark.jobs import run_job
    ms = 1_700_000_000_000
    df = spark.createDataFrame(
        [(ms, "CREATE", ms, "prod", "1",
          ("8", 5, True, ms - 1000, None, None, None, None))],
        "changeTimestamp long, changeType string, snapshotTimestamp long, "
        "stack string, instance string, snapshot struct<userId:string, "
        "responseId:long, passed:boolean, passedOn:long, revoked:boolean, "
        "revokedOn:long, certified:boolean, createdOn:long>",
    )
    r = run_job("certified_quiz_snapshots", df).first()
    assert r["revoked"] is False            # null → false
    assert r["certified"] is True           # null → passed
    assert r["created_on"] == r["passed_on"]  # null → deprecated passed_on
    assert r["user_id"] == 8


def test_registry_deep_nested_and_unknown(spark):
    from synapse_etl_jobs_spark.jobs import run_job
    ms = 1_700_000_000_000
    df = spark.createDataFrame(
        [(ms, "CREATE", 3, ms, (("42",), "9", True))],
        "changeTimestamp long, changeType string, userId long, "
        "snapshotTimestamp long, snapshot struct<"
        "member:struct<ownerId:string>, teamId:string, isAdmin:boolean>",
    )
    r = run_job("team_member_snapshots", df).first()
    assert r["member_id"] == 42 and r["team_id"] == 9  # 3-level flatten + cast
    with pytest.raises(KeyError, match="unknown job"):
        run_job("nope", df)


def test_backfill_node_snapshots_deletednode_and_defaults(spark, tmp_path):
    """deletednode drops: changeType=DELETE, null userId, raw timestamp
    strings; absent snapshot JSON keys default to typed nulls."""
    import json as _json
    import os
    from synapse_etl_jobs_spark.jobs.backfill_node_snapshots import (
        backfill_node_snapshots,
    )
    src = tmp_path / "src" / "2023-11-14"
    os.makedirs(src)
    snap = {"id": "syn77", "createdOn": "2023-11-14T01:02:03Z",
            "modifiedOn": "2023-11-14T01:02:03Z",
            "modifiedByPrincipalId": 9}  # most required fields ABSENT
    with open(src / "part.csv", "w") as f:
        f.write(f'"1700000000000","x","{_json.dumps(snap).replace(chr(34), chr(34)*2)}"\n')
    out = backfill_node_snapshots(
        spark, str(tmp_path / "src"), str(tmp_path / "out"),
        release_number="000042", node_record_type="deletednode",
    )
    r = out.first()
    assert r["changeType"] == "DELETE"
    assert r["instance"] == "42" and r["objectType"] == "ENTITY"
    assert r["snapshot"]["id"] == "syn77"
    # deletednode leaves timestamps as the raw strings
    assert r["snapshot"]["modifiedOn"] == "2023-11-14T01:02:03Z"
    # filename-derived partition fields
    assert r["snapshotTimestamp"] == 1699920000000  # 2023-11-14T00:00Z
    # userId column: all-null columns are omitted from the JSON body by
    # design; defaulted absent fields likewise stay null/absent
    assert "userId" not in out.columns or r["userId"] is None
    assert "name" not in r["snapshot"].asDict() or r["snapshot"]["name"] is None


def test_catalog_sql_over_registered_tables(spark, tmp_path):
    cat = Catalog(spark)
    spark.range(50).select(F.col("id"), (F.col("id") % 5).alias("g")) \
        .write.parquet(str(tmp_path / "a"))
    spark.range(5).select(F.col("id").alias("g"), (F.col("id") * 100).alias("w")) \
        .write.parquet(str(tmp_path / "b"))
    cat.register_parquet("facts", str(tmp_path / "a"))
    cat.register_parquet("dims", str(tmp_path / "b"))
    got = cat.sql("""
        SELECT d.w, count(*) AS n FROM facts f JOIN dims d ON f.g = d.g
        GROUP BY d.w ORDER BY d.w
    """).collect()
    assert [(r["w"], r["n"]) for r in got] == [(i * 100, 10) for i in range(5)]
