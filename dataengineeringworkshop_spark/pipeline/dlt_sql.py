r"""DLT SQL-text front-end for the pipeline runner.

The reference's fourth notebook (`4  Delta Live Tables (SQL).sql`)
declares its whole pipeline as SQL text: ``CREATE [TEMPORARY]
[INCREMENTAL] LIVE TABLE name ( CONSTRAINT \`desc\` EXPECT (pred)
[ON VIOLATION DROP ROW | FAIL UPDATE], … ) TBLPROPERTIES (…)
COMMENT "…" [AS] SELECT …`` with sources ``cloud_files('dir', "json")``,
direct-path ``json.\`path\``` scans, and ``live.x`` /
``STREAM(live.x)`` references (N4:28-34, 102-117, 121-160, 177-201).
:func:`pipeline_from_sql` parses exactly that surface — including the
notebook conventions around it (``-- COMMAND ----------`` cell
separators, ``-- MAGIC`` markdown lines, ``${var}`` pipeline
parameters, the optional ``AS``, optional trailing ``;``) — into a
configured :class:`~dataengineeringworkshop_spark.pipeline.runner.Pipeline`,
so a workshop DLT SQL notebook runs verbatim on the runner.

Out-of-surface constructs raise with the offending statement rather
than mis-executing.
"""

from __future__ import annotations

import re

from dataengineeringworkshop_spark.operators.expectations import Expectation
from dataengineeringworkshop_spark.pipeline.runner import Pipeline

_CELL_SEP = re.compile(r"^--\s*COMMAND\s*-+\s*$", re.MULTILINE)

_HEADER_RE = re.compile(
    r"^create\s+(?:or\s+refresh\s+)?"
    r"(?P<temporary>temporary\s+)?"
    r"(?P<incremental>incremental\s+)?"
    r"live\s+(?P<kind>table|view)\s+"
    r"(?P<name>[A-Za-z_][A-Za-z_0-9]*)\s*"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)

_CONSTRAINT_RE = re.compile(
    r"constraint\s+(?:`(?P<qname>[^`]+)`|(?P<name>\w+))\s+"
    r"expect\s*\((?P<pred>.*)\)\s*"
    r"(?:on\s+violation\s+(?P<action>drop\s+row|fail\s+update|quarantine))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_TBLPROPS_RE = re.compile(r"^tblproperties\s*\(", re.IGNORECASE)
_COMMENT_RE = re.compile(r"^comment\s+(\"[^\"]*\"|'[^']*')\s*", re.IGNORECASE)


def _strip_notebook(sql_text: str) -> list[str]:
    """Notebook text → list of statement strings (comments removed,
    empty cells dropped, trailing semicolons stripped)."""
    from dataengineeringworkshop_spark.sqlcompat import strip_line_comments

    stmts = []
    for cell in _CELL_SEP.split(sql_text):
        # ONE quote-aware pass: '-- MAGIC' markdown lines and plain
        # comments are both '--'-to-EOL outside string literals, while a
        # '--'-prefixed line INSIDE a multi-line COMMENT "…" literal is
        # data and survives (a line-anchored regex can't tell these
        # apart; the scanner can)
        cell = strip_line_comments(cell)
        for stmt in _split_semicolons(cell):
            stmt = stmt.strip()
            if stmt:
                stmts.append(stmt)
    return stmts


# quote/paren-aware scanning shared with sqldml (one implementation)
from dataengineeringworkshop_spark.sqlcompat import (  # noqa: E402
    split_top_level as _split_top_level,
    take_paren_group as _take_paren_group,
)

_DLT_QUOTES = "'\"`"


def _split_semicolons(text: str) -> list[str]:
    """Split on ``;`` outside quotes/backticks."""
    return _split_top_level(text, r";", quotes=_DLT_QUOTES)


def _split_top_commas(text: str) -> list[str]:
    return _split_top_level(text, r",", quotes=_DLT_QUOTES)


def _parse_constraints(block: str) -> list[Expectation]:
    out = []
    for item in _split_top_commas(block):
        item = item.strip()
        if not item:
            continue
        m = _CONSTRAINT_RE.match(item)
        if not m:
            raise ValueError(f"unparseable CONSTRAINT clause: {item!r}")
        name = m.group("qname") or m.group("name")
        action = (m.group("action") or "").lower()
        mode = (
            "drop" if "drop" in action
            else "fail" if "fail" in action
            else "quarantine" if "quarantine" in action
            else "warn"
        )
        pred = m.group("pred").strip()
        out.append(Expectation(name, pred, mode=mode))
    return out


def parse_statement(stmt: str) -> dict:
    """One CREATE … LIVE … statement → spec dict (kind, name,
    temporary, incremental, expectations, comment, properties, sql)."""
    m = _HEADER_RE.match(stmt.strip())
    if not m:
        raise ValueError(
            f"statement is not in the DLT SQL surface: {stmt[:100]!r}"
        )
    spec = {
        "name": m.group("name"),
        "view": m.group("kind").lower() == "view",
        "temporary": bool(m.group("temporary")),
        "incremental": bool(m.group("incremental")),
        "expectations": [],
        "comment": "",
        "properties": {},
    }
    rest = m.group("rest").lstrip()
    # optional constraint block: a paren group BEFORE tblproperties/
    # comment/as/select that contains CONSTRAINT
    if rest.startswith("("):
        inside, after = _take_paren_group(rest)
        if re.match(r"\s*constraint\b", inside, re.IGNORECASE):
            spec["expectations"] = _parse_constraints(inside)
            rest = after.lstrip()
    # TBLPROPERTIES / COMMENT in either order, any count
    while True:
        if _TBLPROPS_RE.match(rest):
            inside, after = _take_paren_group(rest[rest.index("(") :])
            for kv in _split_top_commas(inside):
                km = re.match(
                    r"""\s*["']([^"']+)["']\s*=\s*["']([^"']*)["']\s*$""", kv
                )
                if km:
                    spec["properties"][km.group(1)] = km.group(2)
            rest = after.lstrip()
            continue
        cm = _COMMENT_RE.match(rest)
        if cm:
            spec["comment"] = cm.group(1)[1:-1]
            rest = rest[cm.end() :].lstrip()
            continue
        break
    rest = re.sub(r"^as\b", "", rest, flags=re.IGNORECASE).strip()
    if not re.match(r"^\(?\s*select\b", rest, re.IGNORECASE):
        raise ValueError(f"expected SELECT body, got: {rest[:80]!r}")
    spec["sql"] = rest
    return spec


def pipeline_from_sql(
    name: str,
    storage_dir: str,
    sql_text: str,
    params: dict[str, str] | None = None,
    schema_hints: dict[str, str] | None = None,
) -> Pipeline:
    """Parse a DLT SQL notebook/script into a ready-to-run Pipeline.

    ``params`` substitutes ``${key}`` occurrences (the notebook's
    ``${mypipeline.data_path}`` convention); ``schema_hints`` maps
    dataset name → hint DDL for its ``cloud_files`` source (DLT passes
    these as pipeline config, outside the SQL text)."""
    if params:
        for k, v in params.items():
            sql_text = sql_text.replace("${" + k + "}", v)
    p = Pipeline(name, storage_dir)
    for stmt in _strip_notebook(sql_text):
        spec = parse_statement(stmt)
        if spec["view"]:
            if spec["expectations"]:
                # the runner never materializes views, so their
                # constraints would have no enforcement point — refuse
                # rather than silently dropping them
                raise ValueError(
                    f"LIVE VIEW {spec['name']!r} declares CONSTRAINT "
                    "clauses, but views are not materialized here and "
                    "the expectations could not be enforced; make it a "
                    "TEMPORARY LIVE TABLE instead"
                )
            p.view(spec["name"], spec["sql"], comment=spec["comment"])
        else:
            p.table(
                spec["name"],
                spec["sql"],
                incremental=spec["incremental"],
                temporary=spec["temporary"],
                expectations=spec["expectations"],
                schema_hints=(schema_hints or {}).get(spec["name"]),
                comment=spec["comment"],
            )
    return p
