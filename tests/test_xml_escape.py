"""f21_xml_funcs_breadth's safety contract: the compose→parse XML
roundtrip must stay well-formed under metacharacter- AND
control-character-bearing input, not just the fixture's clean
event_type domain.  The probe composes through the SAME shared
constants the registry query uses (``F21_COMPOSE_SPARK`` /
``F21_SANITIZE_DUCK`` in plans/breadth.py), so a production sanitizer
change cannot pass here while diverging in the query."""

from __future__ import annotations

import duckdb

from dataengineeringworkshop_spark.plans.breadth import (
    F21_COMPOSE_SPARK,
    F21_SANITIZE_DUCK,
    XML_SANITIZE_PATTERN,
)


def test_sanitize_pattern_covers_xml_illegal_controls():
    """The shared class must strip every XML metacharacter plus the
    XML-1.0-illegal C0 range (below 0x20 except TAB/LF/CR)."""
    import re

    rx = re.compile(XML_SANITIZE_PATTERN)
    for ch in '&<>"\'':
        assert rx.match(ch), f"metacharacter {ch!r} not sanitized"
    for cp in range(0x20):
        ch = chr(cp)
        if ch in "\t\n\r":
            assert not rx.match(ch), f"legal control {cp:#x} over-stripped"
        else:
            assert rx.match(ch), f"XML-illegal control {cp:#x} not sanitized"


def test_hostile_event_type_roundtrips_sanitized(spark):
    hostile = [
        (1, "click&buy", 3),
        (2, 'a<b>"c\'d', 7),
        (3, "plain", 9),
        (4, "nul\x00bell\x07esc\x1b", 2),  # XML-illegal control chars
        (5, "tab\tok\nlf", 5),  # legal controls must SURVIVE
    ]
    spark.createDataFrame(
        hostile, "event_id BIGINT, event_type STRING, user_id BIGINT"
    ).createOrReplaceTempView("xml_probe")
    got = spark.sql(
        f"""
        WITH x AS (
            SELECT event_id, event_type, user_id,
                   {F21_COMPOSE_SPARK} AS doc
            FROM xml_probe
        )
        SELECT event_id, xpath_string(doc, '/e/t') AS t,
               xpath_int(doc, '/e/k') AS k2,
               xpath_string(doc, '/e/u/@uid') AS uid
        FROM x ORDER BY event_id
        """
    ).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE probe(event_id BIGINT, event_type VARCHAR, user_id BIGINT)"
    )
    con.executemany("INSERT INTO probe VALUES (?, ?, ?)", hostile)
    oracle = con.execute(
        f"""
        SELECT event_id,
               {F21_SANITIZE_DUCK} AS t,
               CAST(event_id % 100 AS INTEGER) AS k2,
               CAST(user_id % 10 AS VARCHAR) AS uid
        FROM probe ORDER BY event_id
        """
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in oracle]
    # every metacharacter and illegal control really was neutralized,
    # nothing parsed to NULL; legal whitespace controls survive intact
    assert got[0].t == "click_buy" and got[1].t == "a_b__c_d"
    assert got[3].t == "nul_bell_esc_"
    assert got[4].t == "tab\tok\nlf"
