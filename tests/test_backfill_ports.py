"""Unit tests for the remaining reference backfill ports: the five
Athena SQL INSERT jobs (jobs/backfill_athena.py), the two file-download
scripts, and the access-record reshape (jobs/backfill_access.py,
jobs/backfill_file_downloads.py). End-to-end value correctness is the
oracle gate's job (entry queries backfill_*); these pin edge semantics
on small hand-built inputs."""

import pyspark.sql.functions as F

from synapse_etl_jobs_spark.jobs.backfill_athena import (
    ATHENA_BACKFILLS, run_athena_backfill,
)
from synapse_etl_jobs_spark.jobs.backfill_access import backfill_access_records
from synapse_etl_jobs_spark.jobs.backfill_file_downloads import (
    backfill_kinesis_file_downloads, backfill_old_dwh_file_downloads,
)

SRC_COLS = "change_timestamp long, record_type string, json_record string, instance string, snapshot_date string"


def _src(spark, json_record, change_ts=1_700_000_002_000):
    return spark.createDataFrame(
        [(change_ts, "rec", json_record, "000000123", "2023-11-14")], SRC_COLS
    )


def test_verifications_state_history_lambda(spark, tmp_path):
    """The N5 transform: each history element's ISO createdOn becomes
    epoch-ms inside the typed array; absent fields parse to nulls."""
    j = (
        '{"id":"9","createdOn":"2023-11-14T22:13:20Z","createdBy":"77",'
        '"emails":["a@x.org"],'
        '"stateHistory":[{"createdOn":"2023-11-14T22:13:20Z","createdBy":"77",'
        '"state":"SUBMITTED"},{"createdOn":"2023-11-14T22:15:00Z",'
        '"createdBy":"78","state":"REJECTED","reason":"bad"}],'
        '"attachments":[{"fileName":"f.pdf","id":"5"}]}'
    )
    _src(spark, j, change_ts=1_700_000_000_000).createOrReplaceTempView("old_v")
    out = run_athena_backfill(spark, "verifications", "old_v", str(tmp_path / "t"))
    row = out.collect()[0]
    sh = row["snapshot"]["stateHistory"]
    assert [e["state"] for e in sh] == ["SUBMITTED", "REJECTED"]
    assert sh[0]["createdOn"] == 1_700_000_000_000
    assert sh[1]["createdOn"] == 1_700_000_100_000
    assert sh[0]["reason"] is None and sh[1]["reason"] == "bad"
    assert row["snapshot"]["attachments"][0]["fileName"] == "f.pdf"
    # created == change ⇒ CREATE; userId from createdBy; instance strip
    assert row["changetype"] == "CREATE"
    assert row["userid"] == 77
    assert row["instance"] == "123"
    assert (row["year"], row["month"], row["day"]) == ("2023", "11", "14")


def test_changetype_update_past_one_second(spark, tmp_path):
    j = '{"id":"1","isIndividual":true,"creationDate":"2023-11-14T22:13:20Z"}'
    # change 1500ms after creation ⇒ UPDATE (>1s rule)
    _src(spark, j, change_ts=1_700_000_001_500).createOrReplaceTempView("old_ug")
    out = run_athena_backfill(spark, "usergroup", "old_ug", str(tmp_path / "t"))
    row = out.collect()[0]
    assert row["changetype"] == "UPDATE"
    assert row["userid"] is None  # ":null as userId" — no change user in old data
    assert row["snapshot"]["creationDate"] == 1_700_000_000_000


def test_team_member_nested_member_subtree(spark, tmp_path):
    j = ('{"teamId":"42","member":{"ownerId":"7","firstName":"A",'
         '"isIndividual":true},"isAdmin":false}')
    _src(spark, j).createOrReplaceTempView("old_tm")
    out = run_athena_backfill(spark, "team_member", "old_tm", str(tmp_path / "t"))
    row = out.collect()[0]
    assert row["changetype"] == "UPDATE"  # static, reference :66-67
    assert row["userid"] == 7             # nested member.ownerId path
    assert row["snapshot"]["member"]["firstName"] == "A"
    assert row["snapshot"]["member"]["email"] is None  # drift → typed null


def test_every_athena_job_registered(spark):
    assert set(ATHENA_BACKFILLS) == {
        "usergroup", "team", "team_member", "userprofile", "verifications"
    }


def test_old_dwh_success_prefix_filter_and_union(spark, tmp_path):
    bulk = spark.createDataFrame(
        [(1_700_000_000_000,
          '{"userId":5,"resultZipFileHandleId":"z1","fileSummary":['
          '{"fileHandleId":"f1","associateObjectId":"a1",'
          '"associateObjectType":"FileEntity","status":"SUCCESS"},'
          '{"fileHandleId":"f2","associateObjectId":"a2",'
          '"associateObjectType":"TableEntity","status":"SUCCESSFUL"},'
          '{"fileHandleId":"f3","associateObjectId":"a3",'
          '"associateObjectType":"FileEntity","status":"FAILURE"}]}')],
        "timestamp long, json string",
    )
    single = spark.createDataFrame(
        [(1_700_000_000_000,
          '{"userId":6,"downloadedFile":{"fileHandleId":"f9",'
          '"associateObjectId":"a9","associateObjectType":"FileEntity"}}')],
        "timestamp long, json string",
    )
    out = backfill_old_dwh_file_downloads(
        spark, bulk, single, str(tmp_path / "t"), release_number="000000042"
    )
    rows = {r["file_handle_id"]: r for r in out.collect()}
    # re.match("SUCCESS", s) is a PREFIX match: SUCCESS + SUCCESSFUL pass
    assert set(rows) == {"f1", "f2", "f9"}
    assert rows["f1"]["downloaded_file_handle_id"] == "z1"
    assert rows["f9"]["downloaded_file_handle_id"] is None
    assert rows["f9"]["user_id"] == 6
    assert all(r["instance"] == "42" for r in rows.values())
    assert str(rows["f1"]["record_date"]) == "2023-11-14"


def test_kinesis_mapping_and_record_date(spark, tmp_path):
    src = spark.createDataFrame(
        [(9, "2023-11-14 22:13:20", 3, "fh", "FileEntity", "a", "prod", "7")],
        "userid long, timestamp string, projectid long, filehandleid string, "
        "associatetype string, associateid string, stack string, instance string",
    )
    out = backfill_kinesis_file_downloads(spark, src, str(tmp_path / "t"))
    row = out.collect()[0]
    assert row["user_id"] == 9 and row["project_id"] == 3
    assert row["downloaded_file_handle_id"] is None
    assert str(row["record_date"]) == "2023-11-14"


def test_access_backfill_payload_struct_and_partitions(spark, tmp_path):
    src = spark.createDataFrame(
        [("s1", "1700000000000", "7", "GET", "/repo/v1/entity/syn1", "ua",
          "h", None, "v", "3", "12", "true", "prod", "000000123",
          "2023-11-14", "vm", "1", None, "200", None, None, "bearer", "ip")],
        "session_id string, timestamp string, user_id string, method string, "
        "request_url string, user_agent string, host string, origin string, "
        "via string, thread_id string, elapse_ms string, success string, "
        "stack string, instance string, date string, vm_id string, "
        "return_object_id string, query_string string, response_status string, "
        "oauth_client_id string, basic_auth_username string, "
        "auth_method string, x_forwarded_for string",
    )
    out = backfill_access_records(spark, src, str(tmp_path / "j"))
    row = out.collect()[0]
    p = row["payload"]
    assert p["timestamp"] == 1_700_000_000_000 and p["userId"] == 7
    assert p["success"] is True and p["responseStatus"] == 200
    assert row["timestamp"] == 1_700_000_000_000
    assert row["instance"] == "000000123"  # NOT stripped in this job
    # partition layout: int year, '%02d' month/day (reference :23-25);
    # the recursive read-back folds partition dirs away, so check disk
    assert (tmp_path / "j" / "year=2023" / "month=11" / "day=14").is_dir()


def test_type_drifted_booleans_coerce_like_presto(spark, tmp_path):
    """Schema drift: a boolean arriving as a JSON *string* ("true") must
    coerce, not null out. Presto's json_extract_scalar always returns
    varchar and the reference SQL CASTs it; the parse schema therefore
    keeps every leaf a string and the SELECT casts explicitly — a typed
    from_json field would make Jackson null the drifted value."""
    j = '{"id":"1","isIndividual":"true","creationDate":"2023-11-14T22:13:20Z"}'
    _src(spark, j, change_ts=1_700_000_000_000).createOrReplaceTempView("drift_ug")
    out = run_athena_backfill(spark, "usergroup", "drift_ug", str(tmp_path / "t"))
    row = out.collect()[0]
    assert row["snapshot"]["isIndividual"] is True
    assert row["snapshot"]["creationDate"] == 1_700_000_000_000


def test_type_drifted_nested_booleans_and_null_subtrees(spark, tmp_path):
    """Drifted booleans inside nested structs/arrays coerce through the
    element-wise CAST, and an absent/null sub-object stays NULL (the
    cast is null-preserving — no phantom all-null struct appears)."""
    drifted = (
        '{"teamId":"5","isAdmin":"false",'
        '"member":{"ownerId":"7","userName":"u","isIndividual":"true"}}'
    )
    _src(spark, drifted).createOrReplaceTempView("drift_tm")
    out = run_athena_backfill(spark, "team_member", "drift_tm",
                              str(tmp_path / "t1"))
    row = out.collect()[0]
    assert row["snapshot"]["isAdmin"] is False
    assert row["snapshot"]["member"]["isIndividual"] is True
    assert row["snapshot"]["member"]["ownerId"] == "7"
    assert row["userid"] == 7

    absent = '{"teamId":"6","isAdmin":true}'
    _src(spark, absent).createOrReplaceTempView("drift_tm2")
    out2 = run_athena_backfill(spark, "team_member", "drift_tm2",
                               str(tmp_path / "t2"))
    row2 = out2.collect()[0]
    assert row2["snapshot"]["member"] is None
    assert row2["snapshot"]["isAdmin"] is True


def test_type_drifted_array_struct_booleans(spark, tmp_path):
    """userprofile preferences: array<struct<..,value:boolean>> built by
    casting the string-leaf parse — drifted and well-typed elements both
    coerce; notificationSettings struct likewise."""
    j = (
        '{"ownerId":"7","createdOn":"2023-11-14T22:13:20Z",'
        '"notificationSettings":{"sendEmailNotifications":"true",'
        '"markEmailedMessagesAsRead":false},'
        '"preferences":[{"name":"a","value":"true"},{"name":"b","value":false}]}'
    )
    _src(spark, j, change_ts=1_700_000_000_000).createOrReplaceTempView("drift_up")
    out = run_athena_backfill(spark, "userprofile", "drift_up", str(tmp_path / "t"))
    row = out.collect()[0]
    ns = row["snapshot"]["notificationSettings"]
    assert ns["sendEmailNotifications"] is True
    assert ns["markEmailedMessagesAsRead"] is False
    prefs = row["snapshot"]["preferences"]
    assert [(p["name"], p["value"]) for p in prefs] == [("a", True), ("b", False)]
