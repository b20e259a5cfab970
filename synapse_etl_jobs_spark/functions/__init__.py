"""Vectorized scalar-function library.

Native Catalyst expressions (``scalars``) for functions whose semantics
survive the Python→Java regex translation, Arrow-backed pandas UDFs
(``access_record``) for the URL/user-agent normalizers whose Python-regex
behavior is pinned by the reference's 76-case test corpus.
"""

from synapse_etl_jobs_spark.functions.scalars import (  # noqa: F401
    filename_to_date,
    iso8601_to_millis,
    millis_to_timestamp,
    ms_to_partition_date,
    remove_padded_leading_zeros,
    syn_id_string_to_int,
    timestamp_to_millis,
    year_month_day,
)
