"""f21_xml_funcs_breadth's safety contract: the compose→parse XML
roundtrip must stay well-formed under metacharacter-bearing input, not
just the fixture's clean event_type domain — both engines sanitize with
the same character class, so extracted values keep matching the oracle's
re-derivation."""

from __future__ import annotations

import duckdb


def test_hostile_event_type_roundtrips_sanitized(spark):
    hostile = [
        (1, "click&buy", 3),
        (2, 'a<b>"c\'d', 7),
        (3, "plain", 9),
    ]
    spark.createDataFrame(
        hostile, "event_id BIGINT, event_type STRING, user_id BIGINT"
    ).createOrReplaceTempView("xml_probe")
    got = spark.sql(
        """
        WITH x AS (
            SELECT event_id, event_type, user_id,
                   concat('<e><k>', CAST(event_id % 100 AS STRING),
                          '</k><t>',
                          regexp_replace(event_type, '[&<>"\\']', '_'),
                          '</t><u uid="',
                          CAST(user_id % 10 AS STRING), '"/></e>') AS doc
            FROM x_src
        )
        SELECT event_id, xpath_string(doc, '/e/t') AS t,
               xpath_int(doc, '/e/k') AS k2,
               xpath_string(doc, '/e/u/@uid') AS uid
        FROM x ORDER BY event_id
        """.replace("x_src", "xml_probe")
    ).collect()
    oracle = duckdb.sql(
        """
        SELECT event_id,
               regexp_replace(event_type, '[&<>"'']', '_', 'g') AS t,
               CAST(event_id % 100 AS INTEGER) AS k2,
               CAST(user_id % 10 AS VARCHAR) AS uid
        FROM (VALUES (1, 'click&buy', 3),
                     (2, 'a<b>"c''d', 7),
                     (3, 'plain', 9)) v(event_id, event_type, user_id)
        ORDER BY event_id
        """
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in oracle]
    # every metacharacter really was neutralized, nothing parsed to NULL
    assert got[0].t == "click_buy" and got[1].t == "a_b__c_d"
