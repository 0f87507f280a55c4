"""Aggregated query registry: one entry per SURVEY.md §2 inventory row.

Each module contributes a Registry of (query builder, DuckDB oracle SQL)
pairs; ``all_queries()`` / ``all_oracles()`` feed __spark_entry__.py and the
pytest parity harness.
"""

from __future__ import annotations

from phoenix_spark.queries._util import Registry


def build_registry() -> Registry:
    # Imports are local so a syntax error in one module surfaces per-module
    # under pytest rather than killing the whole registry at import time.
    from phoenix_spark.queries import (  # noqa: PLC0415
        aggregates,
        filters,
        scans,
    )

    modules = [scans, filters, aggregates]
    for name in (
        "joins",
        "joins_ext",
        "tpch_ext",
        "sorts",
        "setops",
        "mutations_ddl",
        "aggregates_ext",
        "scalar_binary",
        "sources_ext",
        "scalar_str",
        "scalar_math",
        "scalar_datetime",
        "scalar_array",
        "scalar_json",
        "windows",
        "pipeline_text",
        "pipeline_dedup",
        "pipeline_similarity",
        "pipeline_multimodal",
    ):
        try:
            mod = __import__(f"phoenix_spark.queries.{name}", fromlist=[name])
            modules.append(mod)
        except ModuleNotFoundError as e:
            # Only swallow "this optional module doesn't exist yet"; a missing
            # dependency *inside* an existing module must fail loudly.
            if e.name != f"phoenix_spark.queries.{name}":
                raise
            continue

    reg = Registry()
    for mod in modules:
        reg.merge(mod.REG)
    return reg


_REG: Registry | None = None


def registry() -> Registry:
    global _REG
    if _REG is None:
        _REG = build_registry()
    return _REG


def all_queries():
    return dict(registry().queries)


def all_oracles():
    return dict(registry().oracles)
