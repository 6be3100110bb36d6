"""Stored-procedure analog — reference S4 on Spark 4 SQL scripting.

The reference calls server-side procedures by name
(``call_snowflake_procedure``, mlir.py:77-79): a named, parameterized,
multi-statement SQL body executed as one unit on the engine. Spark's
native equivalent since 4.0 is SQL scripting (``BEGIN ... END`` with
``DECLARE``/``SET``, control flow, temp-view DDL), enabled by
``spark.sql.scripting.enabled``. This module keeps the reference's
call surface — a registry of named procedures invoked with keyword
arguments — and executes the body as one ``spark.sql`` call with
named-parameter binding (``:param``), returning the script's final
statement as a DataFrame.

Scale notes: the script body is planned by Catalyst statement by
statement like any other SQL — nothing here is driver-side row work,
and parameter binding is literal substitution at parse time (no string
formatting, no injection surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[str, tuple[str, dict]] = {}


def register_procedure(name: str, body: str, defaults: dict | None = None) -> None:
    """Register (or replace) a named SQL-script procedure. The body
    must be a single ``BEGIN ... END`` block; its last statement's
    result is what ``call_procedure`` returns. ``defaults`` supplies
    parameter values bound when the caller omits them — kept Python-side
    because Spark's named-parameter binding has no unbound-with-default
    notion (an unreferenced ``DECLARE ... DEFAULT`` would be dead code;
    review catch)."""
    stripped = body.strip()
    if not (stripped.upper().startswith("BEGIN") and stripped.upper().endswith("END")):
        raise ValueError(f"procedure {name!r} body must be a BEGIN ... END block")
    _REGISTRY[name] = (body, dict(defaults or {}))


def list_procedures() -> list[str]:
    return sorted(_REGISTRY)


def call_procedure(spark: SparkSession, name: str, **params) -> DataFrame:
    """Execute a registered procedure with named-parameter binding
    (reference: ``call_snowflake_procedure(proc_name)``,
    mlir.py:77-79). Raises KeyError for unknown names — same contract
    as the reference's server-side lookup failure."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown procedure {name!r}; registered: {list_procedures()}"
        )
    body, defaults = _REGISTRY[name]
    args = {**defaults, **params}
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(body, args=args or None)


# --------------------------------------------------------------------------
# Built-in procedures over the standard `documents` temp view
# --------------------------------------------------------------------------

register_procedure(
    "source_quality_report",
    """
BEGIN
  DECLARE min_docs BIGINT;
  SET min_docs = :min_docs;
  CREATE OR REPLACE TEMPORARY VIEW _proc_src_stats AS
    SELECT source,
           count(*) AS n_docs,
           count(text) AS n_with_text,
           sum(n_chars) AS total_chars
    FROM documents_v
    GROUP BY source;
  SELECT source, n_docs, n_with_text, total_chars,
         CAST(floor(total_chars / n_docs) AS BIGINT) AS avg_chars_floor
  FROM _proc_src_stats
  WHERE n_docs >= min_docs
  ORDER BY source;
END
""",
    defaults={"min_docs": 1},
)
