"""Ported reference unit tests (tests/test_utils.py:7-53 and
tests/test_user_profile_snapshots.py:11-32), applied through DataFrames so
the vectorized expressions — not a Python reimplementation — are what's
pinned."""

import pyspark.sql.functions as F
import pytest

from synapse_etl_jobs_spark.functions import scalars


def _apply(spark, values, colfn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(colfn(F.col("v")).alias("out")).collect()]


SYN_ID_CASES = [
    ("syn123", 123),
    ("syn123.1", 123),
    ("123", 123),
    ("123.23", 123),
    ("9223372036854775807", 9223372036854775807),
    ("", None),
    ("  ", None),
    (None, None),
    ("syn", None),
    ("abc123", None),
]


def test_syn_id_string_to_int(spark):
    vals = [c[0] for c in SYN_ID_CASES]
    expected = [c[1] for c in SYN_ID_CASES]
    assert _apply(spark, vals, scalars.syn_id_string_to_int) == expected


def test_ms_to_partition_date(spark):
    out = _apply(spark, [1680758367496], scalars.ms_to_partition_date, "bigint")
    assert out == ["2023-04-06"]


def test_remove_padded_leading_zeros(spark):
    out = _apply(
        spark, ["000000236", "0000002360", None, "12"],
        scalars.remove_padded_leading_zeros,
    )
    assert out == ["236", "2360", None, "12"]


def test_first_element_email(spark):
    df = spark.createDataFrame(
        [(["a@x.org", "b@x.org"],), ([],), (None,)], "emails array<string>"
    )
    out = [r[0] for r in df.select(scalars.first_element("emails")).collect()]
    assert out == ["a@x.org", None, None]


def test_change_type_from_timestamps(spark):
    df = spark.createDataFrame(
        [(1000, 1500), (1000, 2500), (1000, 1000)], "created long, changed long"
    )
    out = [
        r[0]
        for r in df.select(
            scalars.change_type_from_timestamps("created", "changed")
        ).collect()
    ]
    assert out == ["CREATE", "UPDATE", "CREATE"]


def test_year_month_day(spark):
    df = spark.createDataFrame([("2023-04-06",)], "d string").select(
        F.to_date("d").alias("d")
    )
    y, m, d = scalars.year_month_day("d")
    row = df.select(y, m, d).collect()[0]
    assert tuple(row) == ("2023", "04", "06")


def test_millis_roundtrip(spark):
    df = spark.createDataFrame([(1680758367496,)], "ms long")
    row = df.select(
        scalars.timestamp_to_millis(scalars.millis_to_timestamp("ms"))
    ).collect()[0]
    assert row[0] == 1680758367496


def test_iso8601_to_millis(spark):
    out = _apply(spark, ["2023-04-06T05:19:27.496Z"], scalars.iso8601_to_millis)
    assert out == [1680758367496]


def test_syn_id_ansi_safe_overflow_and_whitespace(spark):
    """ANSI-mode safety: digits beyond Long.MAX -> null (not a crash);
    tab/newline padding is stripped like Python str.strip()."""
    df = spark.createDataFrame(
        [("syn99999999999999999999999",), ("\tsyn123\n",), (" syn5 ",)], "s string"
    )
    out = [r[0] for r in df.select(scalars.syn_id_string_to_int("s")).collect()]
    assert out == [None, 123, 5]


def test_filename_to_date_nonmatching_is_null(spark):
    df = spark.createDataFrame(
        [("s3://b/2024-03-05/f.json",), ("s3://b/no-date/f.json",)], "p string"
    )
    out = [r[0] for r in df.select(scalars.filename_to_date("p")).collect()]
    assert str(out[0]) == "2024-03-05" and out[1] is None


def test_change_type_exact_boundary_is_update(spark):
    """Python reference semantics: delta == threshold => UPDATE."""
    df = spark.createDataFrame([(1000, 2000)], "created long, changed long")
    out = df.select(
        scalars.change_type_from_timestamps("created", "changed")
    ).collect()[0][0]
    assert out == "UPDATE"
