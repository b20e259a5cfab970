"""Access-record normalizers as Arrow-batched pandas UDFs.

The reference implements these as row-at-a-time Glue ``map`` functions
(src/scripts/glue_jobs/process_access_record.py:59-195) whose behavior is
pinned by 76 unit tests (tests/test_process_access_record.py). Python and
Java regex dialects diverge on several constructs used here (``\\b`` inline
groups, ``(?i)`` scoping), so these stay in Python — but vectorized: each
function below takes/returns ``pandas.Series`` and is wrapped in a
``pandas_udf`` so Spark ships Arrow batches, not pickled rows.

Design note (scale): these UDFs are pure Series→Series with no state, so
they pipeline inside a single stage — no shuffle, no driver involvement.
At 100 TB the cost is one Arrow serialization round-trip per batch;
``spark.sql.execution.arrow.maxRecordsPerBatch`` controls batch sizing.
"""

from __future__ import annotations

import re
import sys
import urllib.parse

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

# Client-family markers (reference constants, process_access_record.py:13-35).
WEB_CLIENT = "Synapse-Web-Client"
SYNAPSER_CLIENT = "synapser"
R_CLIENT = "synapseRClient"
PYTHON_CLIENT = "synapseclient"
OLD_JAVA_CLIENT = "Synpase-Java-Client"  # historic typo preserved by the reference
JAVA_CLIENT = "Synapse-Java-Client"
COMMAND_LINE_CLIENT = "synapsecommandlineclient"
ELB_CLIENT = "ELB-HealthChecker"
STACK_CLIENT = "SynapseRepositoryStack"
WEB_BROWSER_RE = r"(?i)(mozilla|safari|opera|lynx|ucweb|chrome|firefox)"
_WEB_BROWSER_CONTAINS = r"(?i)(?:mozilla|safari|opera|lynx|ucweb|chrome|firefox)"
_VERSION_RE = r"/(\S+)"
# anchored browser pattern: re.match semantics (match at string start)
_WEB_BROWSER_ANCHORED = r"(?i)^(mozilla|safari|opera|lynx|ucweb|chrome|firefox)/(\S+)"


# ---------------------------------------------------------------------------
# pandas-level implementations (unit-tested directly, no JVM needed)
# ---------------------------------------------------------------------------

def decode_url_series(s: pd.Series) -> pd.Series:
    """Percent-decode then drop ALL whitespace (reference :95-100)."""
    def _one(u):
        if u is None or (isinstance(u, float) and np.isnan(u)):
            return None
        return "".join(urllib.parse.unquote(u).split())

    return s.map(_one)


def normalized_method_signature_series(url: pd.Series) -> pd.Series:
    """URL → normalized method signature (reference :59-93).

    Lowercase + percent-decode + strip whitespace; everything before the
    first ``/v1/`` is dropped (keeping the leading slash); special-cased
    prefixes map to fixed signatures; otherwise four sequential regex
    substitutions replace ids (``syn123``, ``fh123``, bare numerics,
    ``;…`` matrix params) with ``#``.
    """
    s = decode_url_series(url.str.lower())
    s = s.fillna("")
    has_v1 = s.str.contains("/v1/", regex=False)
    # url[find('/v1/')+3:] == '/' + everything after the first '/v1/'
    rest = ("/" + s.str.split("/v1/", n=1).str[-1]).where(has_v1, "")

    generic = rest.str.replace(r";[^/]+", "", regex=True)
    generic = generic.str.replace(r"[^\w\/]", "", regex=True)
    generic = generic.str.replace(
        r"\b(syn|fh)\d+(\.\d+)?\b|\b\d+(\w+)?[^/]\b", "#", regex=True
    )
    generic = generic.str.replace(r"/\d+", "/#", regex=True)

    conditions = [
        ~has_v1,
        rest.str.startswith("/entity/md5"),
        rest.str.startswith("/evaluation/name"),
        rest.str.startswith("/entity/alias"),
        rest.str.startswith("/2fa"),
        rest.str.startswith("/user/bundle"),
        rest.str.contains("/access/", regex=False),
        rest.str.contains("/schema/type/registered/", regex=False),
    ]
    choices = [
        "INVALID URL",
        "/entity/md5/#",
        "/evaluation/name/#",
        "/entity/alias/#",
        rest,
        "/user/bundle",
        "/objects/#/access/#",
        "/schema/type/registered/#",
    ]
    out = np.select(conditions, choices, default=generic)
    return pd.Series(out, index=url.index, dtype="object")


def client_series(user_agent: pd.Series) -> pd.Series:
    """User-agent → client enum; match order matters (reference :102-134)."""
    ua = user_agent.fillna("")
    conditions = [
        ua.str.contains(WEB_CLIENT, regex=False),
        ua.str.contains(_WEB_BROWSER_CONTAINS, regex=True),
        ua.str.contains(JAVA_CLIENT, regex=False),
        ua.str.contains(OLD_JAVA_CLIENT, regex=False),
        ua.str.contains(SYNAPSER_CLIENT, regex=False),
        ua.str.contains(R_CLIENT, regex=False),
        ua.str.contains(COMMAND_LINE_CLIENT, regex=False),
        ua.str.contains(PYTHON_CLIENT, regex=False),
        ua.str.contains(ELB_CLIENT, regex=False),
        ua.str.contains(STACK_CLIENT, regex=False),
    ]
    choices = [
        "WEB", "WEB", "JAVA", "JAVA", "SYNAPSER",
        "R", "COMMAND_LINE", "PYTHON", "ELB_HEALTHCHECKER", "STACK",
    ]
    out = np.select(conditions, choices, default="UNKNOWN")
    return pd.Series(out, index=user_agent.index, dtype="object")


def client_version_series(client: pd.Series, user_agent: pd.Series) -> pd.Series:
    """(client, user-agent) → client version (reference :142-177).

    Browser user-agents take group 2 of the anchored browser pattern
    (``re.match`` semantics — must match at string start); every other
    client takes group 1 of ``<marker>/(\\S+)`` searched anywhere.
    """
    out = pd.Series([None] * len(user_agent), index=user_agent.index, dtype="object")
    ua = user_agent.fillna("")
    valid = user_agent.notna()

    def put(mask: pd.Series, extracted: pd.Series) -> None:
        m = mask & valid
        if m.any():
            out.loc[m] = extracted[m].where(extracted[m].notna(), None)

    is_web = client == "WEB"
    browserish = ua.str.contains(_WEB_BROWSER_CONTAINS, regex=True)
    put(is_web & browserish, ua.str.extract(_WEB_BROWSER_ANCHORED, expand=True)[1])
    put(is_web & ~browserish, ua.str.extract(re.escape(WEB_CLIENT) + _VERSION_RE, expand=False))

    is_java = client == "JAVA"
    old_java = ua.str.startswith("Synpase")
    put(is_java & old_java, ua.str.extract(re.escape(OLD_JAVA_CLIENT) + _VERSION_RE, expand=False))
    put(is_java & ~old_java, ua.str.extract(re.escape(JAVA_CLIENT) + _VERSION_RE, expand=False))

    for cli, marker in [
        ("SYNAPSER", SYNAPSER_CLIENT),
        ("R", R_CLIENT),
        ("PYTHON", PYTHON_CLIENT),
        ("ELB_HEALTHCHECKER", ELB_CLIENT),
        ("COMMAND_LINE", COMMAND_LINE_CLIENT),
        ("STACK", STACK_CLIENT),
    ]:
        put(client == cli, ua.str.extract(re.escape(marker) + _VERSION_RE, expand=False))
    return out


def entity_id_series(url: pd.Series) -> pd.Series:
    """URL → entity id (reference :179-195): first ``/entity/(syn)?<digits>``,
    case-insensitive, ``syn`` stripped; values > Long.MAX → null."""
    digits = url.str.lower().str.extract(r"/entity/(?:syn)?(\d+)", expand=False)

    def _to_long(d):
        if d is None or (isinstance(d, float) and np.isnan(d)):
            return None
        v = int(d)  # arbitrary precision — overflow checked before casting
        return v if v <= sys.maxsize else None

    return digits.map(_to_long)


# ---------------------------------------------------------------------------
# Spark-facing pandas UDFs
# ---------------------------------------------------------------------------

@F.pandas_udf(StringType())
def normalized_method_signature_udf(url: pd.Series) -> pd.Series:
    return normalized_method_signature_series(url)


@F.pandas_udf(StringType())
def client_udf(user_agent: pd.Series) -> pd.Series:
    return client_series(user_agent)


@F.pandas_udf(StringType())
def client_version_udf(client: pd.Series, user_agent: pd.Series) -> pd.Series:
    return client_version_series(client, user_agent)


@F.pandas_udf(LongType())
def entity_id_udf(url: pd.Series) -> pd.Series:
    return entity_id_series(url)


@F.pandas_udf(StringType())
def decode_url_udf(url: pd.Series) -> pd.Series:
    return decode_url_series(url)


def normalized_method_signature(method, url) -> Column:
    """Full signature column: ``<METHOD> <normalized-url>`` (reference :49)."""
    m = method if isinstance(method, Column) else F.col(method)
    u = url if isinstance(url, Column) else F.col(url)
    return F.concat_ws(" ", m, normalized_method_signature_udf(u))
