"""Golden syslog parse tests ported from the reference
(src/parse.rs:62-106) plus generator-shaped payloads (FIXTURES.md A1)."""

from pyspark.sql import Row

from hotdog_spark.functions.syslog import parse_syslog_df


def parse_one(spark, line):
    df = spark.createDataFrame([Row(value=line)])
    rows = parse_syslog_df(df, drop_unparsed=False).collect()
    assert len(rows) == 1
    return rows[0]


def test_5424_golden(spark):
    # src/parse.rs:76-89
    line = (
        '<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - '
        '[timeQuality tzKnown="1" isSynced="1" syncAccuracy="505061"] hi'
    )
    r = parse_one(spark, line)
    assert r.msg == "hi"
    assert r.hostname == "coconut"
    assert r.facility == "user"
    assert r.severity == "notice"
    assert r.appname == "tyler"
    assert r.format == "rfc5424"


def test_3164_golden(spark):
    # src/parse.rs:91-105
    r = parse_one(spark, "<190>May 13 21:45:18 coconut hotdog: hi")
    assert r.msg == "hi"
    assert r.hostname == "coconut"
    assert r.appname == "hotdog"
    assert r.facility == "local7"
    assert r.severity == "info"
    assert r.format == "rfc3164"


def test_invalid_dropped(spark):
    # src/parse.rs:66-74: "blah" must fail to parse
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(value="blah")])
    out = parse_syslog_df(df, drop_unparsed=True)
    assert out.count() == 0
    kept = parse_syslog_df(df, drop_unparsed=False).collect()[0]
    assert kept.format is None


def test_5424_json_payload(spark):
    # generator-shaped line (scripts/generate-stdout.rb:12-24)
    line = '<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - {"meta":{"topic":"test"},"i":42}'
    r = parse_one(spark, line)
    assert r.msg == '{"meta":{"topic":"test"},"i":42}'
    assert r.format == "rfc5424"


def test_5424_nil_hostname(spark):
    r = parse_one(spark, "<34>1 2003-10-11T22:14:15.003Z - su - ID47 - BOM'su root' failed")
    assert r.hostname is None
    assert r.appname == "su"
    assert r.severity == "crit"
    assert r.facility == "auth"


def test_3164_no_pri(spark):
    # loose parse succeeds on timestamp; severity/facility stay null
    r = parse_one(spark, "May 13 21:45:18 coconut hotdog: hi")
    assert r.format == "rfc3164"
    assert r.severity is None
    assert r.facility is None
    assert r.appname == "hotdog"


def test_3164_no_tag(spark):
    r = parse_one(spark, "<13>Feb  5 17:32:18 10.0.0.99 Use the BFG!")
    assert r.format == "rfc3164"
    assert r.msg == "Use the BFG!"
    assert r.hostname == "10.0.0.99"
    assert r.appname is None
