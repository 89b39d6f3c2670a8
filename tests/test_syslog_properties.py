"""Property-based round-trip tests for the syslog parser: build lines from
random components, parse with the real Catalyst expressions, assert every
envelope field is recovered (golden-line unit tests live in
test_syslog.py; this covers the component space between them)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from hotdog_spark.functions.syslog import (
    FACILITY_NAMES,
    SEVERITY_NAMES,
    parse_syslog_df,
)

token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-_", min_size=1, max_size=10
).filter(lambda s: s != "-")

message = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\r\n", exclude_categories=("Cc",)
    ),
    max_size=40,
)

rfc5424_parts = st.tuples(
    st.integers(0, 191),  # pri
    token,                # hostname
    token,                # appname
    message,              # msg
    st.sampled_from(["-", '[timeQuality tzKnown="1"]', '[a b="c"][d e="f"]']),
)

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

rfc3164_parts = st.tuples(
    st.integers(0, 191),
    st.sampled_from(MONTHS),
    st.integers(1, 28),
    st.tuples(st.integers(0, 23), st.integers(0, 59), st.integers(0, 59)),
    token,                                     # hostname
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8),  # tag
    message.filter(lambda m: not m.startswith(" ")),
)


def _expected_sev_fac(pri: int):
    sev = SEVERITY_NAMES[pri % 8]
    fac = FACILITY_NAMES[pri // 8] if pri // 8 <= 23 else None
    return sev, fac


@settings(max_examples=12, deadline=None)
@given(batch=st.lists(rfc5424_parts, min_size=1, max_size=20))
def test_rfc5424_round_trip(spark, batch):
    lines = [
        (
            i,
            f"<{pri}>1 2024-01-02T03:04:05.123-07:00 {host} {app} 77 id1 {sd}"
            + (f" {msg}" if msg else ""),
        )
        for i, (pri, host, app, msg, sd) in enumerate(batch)
    ]
    df = spark.createDataFrame(lines, "i long, value string")
    rows = {r.i: r for r in parse_syslog_df(df).collect()}
    assert len(rows) == len(batch)
    for i, (pri, host, app, msg, sd) in enumerate(batch):
        r = rows[i]
        sev, fac = _expected_sev_fac(pri)
        assert r.format == "rfc5424"
        assert r.hostname == host
        assert r.appname == app
        assert (r.msg or "") == msg
        assert r.severity == sev
        assert r.facility == fac


@settings(max_examples=12, deadline=None)
@given(batch=st.lists(rfc3164_parts, min_size=1, max_size=20))
def test_rfc3164_round_trip(spark, batch):
    lines = [
        (
            i,
            f"<{pri}>{mon} {day:2d} {h:02d}:{m:02d}:{s:02d} {host} {tag}: {msg}",
        )
        for i, (pri, mon, day, (h, m, s), host, tag, msg) in enumerate(batch)
    ]
    df = spark.createDataFrame(lines, "i long, value string")
    rows = {r.i: r for r in parse_syslog_df(df).collect()}
    assert len(rows) == len(batch)
    for i, (pri, mon, day, (h, m, s), host, tag, msg) in enumerate(batch):
        r = rows[i]
        sev, fac = _expected_sev_fac(pri)
        assert r.format == "rfc3164", lines[i]
        assert r.hostname == host
        assert r.appname == tag
        assert (r.msg or "") == msg
        assert r.severity == sev
        assert r.facility == fac


def test_garbage_never_parses(spark):
    df = spark.createDataFrame(
        [(1, "blah"), (2, ""), (3, "<13> no version"), (4, "hello world")],
        "i long, value string",
    )
    assert parse_syslog_df(df).count() == 0
