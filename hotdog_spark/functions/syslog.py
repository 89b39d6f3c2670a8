"""RFC 5424 / RFC 3164 syslog parsing as pure Catalyst expressions.

Parity target: the reference's two-stage parse (reference: src/parse.rs:21-59)
— try RFC 5424 first, fall back to a loose RFC 3164 parse whose success is
detected by a parseable timestamp; unparseable lines error out and are
dropped+counted by the caller (src/connection.rs:89-95).

Everything here is ``regexp_extract`` / arithmetic on columns — no Python
UDFs — so the whole parse stays inside whole-stage codegen and scales
linearly with executor cores.  At 100 TB the parse is embarrassingly
parallel: no shuffle, no state, pure map.

Severity/facility numeric→name decode follows the syslog PRI convention:
``severity = pri % 8``, ``facility = pri / 8`` with the short lowercase
names the reference's crates emit (golden pins: ``<13>`` → user/notice,
``<190>`` → local7/info; src/parse.rs:76-105).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEVERITY_NAMES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]

FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
]

# RFC 5424: <PRI>VERSION SP TIMESTAMP SP HOSTNAME SP APP-NAME SP PROCID SP
# MSGID SP STRUCTURED-DATA [SP MSG].  Structured data is `-` or one or more
# `[...]` blocks (params containing a literal `]` are out of scope for the
# regex approximation; the shipped generators never produce them).
RFC5424_RE = (
    r"^<(\d{1,3})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) (-|(?:\[.*?\])+)(?: (.*))?$"
)
_R5_PRI, _R5_VER, _R5_TS, _R5_HOST, _R5_APP, _R5_PROC, _R5_MSGID, _R5_SD, _R5_MSG = range(1, 10)

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"

# RFC 3164 (loose): optional <PRI>, 3-letter month, day, time, host,
# optional `tag[pid]:`, message.  The loose parser only "succeeds" when the
# timestamp parses (src/parse.rs:40), which this regex enforces by
# construction.
RFC3164_RE = (
    rf"^(?:<(\d{{1,3}})>)?({_MONTHS}) {{1,2}}(\d{{1,2}}) "
    rf"(\d{{1,2}}):(\d{{2}}):(\d{{2}})(?: (\S+))?(?: ([^:\s\[\]]+)(?:\[\d+\])?:)? ?(.*)$"
)
_R3_PRI, _R3_MON, _R3_DAY, _R3_H, _R3_M, _R3_S, _R3_HOST, _R3_TAG, _R3_MSG = range(1, 10)

ENVELOPE_FIELDS = ["msg", "severity", "facility", "hostname", "appname"]


def _name_lookup(names: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(n) for n in names]), (idx + F.lit(1)).cast("int"))


def severity_name(pri: Column) -> Column:
    """PRI integer → severity short name (pri % 8)."""
    return _name_lookup(SEVERITY_NAMES, F.pmod(pri.cast("int"), F.lit(8)))


def facility_name(pri: Column) -> Column:
    """PRI integer → facility short name (pri / 8); >23 → null."""
    fac = F.floor(pri.cast("int") / F.lit(8)).cast("int")
    return F.when(fac <= F.lit(23), _name_lookup(FACILITY_NAMES, fac))


def _nil(col: Column) -> Column:
    """RFC 5424 nilvalue `-` → null."""
    return F.when((col != F.lit("-")) & (col != F.lit("")), col)


def parse_syslog(line: Column) -> Column:
    """Parse one raw syslog line into the 5-field envelope struct
    ``{msg, severity, facility, hostname, appname, format}``.

    ``format`` is 'rfc5424' | 'rfc3164' | null (null == unparseable, the
    caller's cue to count+drop, mirroring src/connection.rs:89-95).
    """
    def g5(i: int) -> Column:
        return F.regexp_extract(line, RFC5424_RE, i)

    def g3(i: int) -> Column:
        return F.regexp_extract(line, RFC3164_RE, i)

    is5 = line.rlike(RFC5424_RE)
    is3 = line.rlike(RFC3164_RE)

    pri5 = g5(_R5_PRI).cast("int")
    pri3 = F.when(g3(_R3_PRI) != "", g3(_R3_PRI)).cast("int")

    fmt = F.when(is5, F.lit("rfc5424")).when(is3, F.lit("rfc3164"))

    msg = F.when(is5, g5(_R5_MSG)).when(is3, g3(_R3_MSG))
    severity = F.when(is5, severity_name(pri5)).when(
        is3, F.when(pri3.isNotNull(), severity_name(pri3))
    )
    facility = F.when(is5, facility_name(pri5)).when(
        is3, F.when(pri3.isNotNull(), facility_name(pri3))
    )
    hostname = F.when(is5, _nil(g5(_R5_HOST))).when(is3, _nil(g3(_R3_HOST)))
    appname = F.when(is5, _nil(g5(_R5_APP))).when(is3, _nil(g3(_R3_TAG)))

    return F.struct(
        msg.alias("msg"),
        severity.alias("severity"),
        facility.alias("facility"),
        hostname.alias("hostname"),
        appname.alias("appname"),
        fmt.alias("format"),
    )


def parse_syslog_df(
    df: DataFrame, column: str = "value", drop_unparsed: bool = True
) -> DataFrame:
    """Project a raw-lines DataFrame into envelope columns.

    With ``drop_unparsed`` the unparseable lines are filtered out (the
    caller can observe the drop count via ``metrics.observe_parse``),
    mirroring the count+skip at src/connection.rs:89-95.
    """
    parsed = parse_syslog(F.col(column))
    out = df.withColumn("_syslog", parsed).select(
        *df.columns,
        F.col("_syslog.msg").alias("msg"),
        F.col("_syslog.severity").alias("severity"),
        F.col("_syslog.facility").alias("facility"),
        F.col("_syslog.hostname").alias("hostname"),
        F.col("_syslog.appname").alias("appname"),
        F.col("_syslog.format").alias("format"),
    )
    if drop_unparsed:
        out = out.filter(F.col("format").isNotNull())
    return out
