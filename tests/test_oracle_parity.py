"""Per-query parity vs DuckDB — local mirror of the driver's t2 gate.

Runs every registry query at sf0.001 (fast) and compares against its oracle.
Queries without an oracle get a rows>=0 smoke check only.
"""

from __future__ import annotations

import pytest

from phoenix_spark.queries import all_oracles, all_queries
from tests.conftest import SF_TEST_DIR
from tests.parity import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_TEST_DIR).toPandas()
    if name not in ORACLES:
        assert sdf is not None  # rows-only smoke
        return
    ddf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_driver_window_covers_every_family():
    """The external driver replays only a prefix of the registry (50 entries
    in round 2), so the first 50 names must include at least one
    representative of every operator family — otherwise whole families ship
    without an external correctness row."""
    window = list(QUERIES)[:50]
    families = {
        "window_", "sort_", "setop_", "subq_", "str_", "math_", "dt_",
        "arr_", "mutation_", "dedup_", "similarity_", "text_", "mm_",
        "ddl_", "bin_",
    }
    present = {f for f in families if any(n.startswith(f) for n in window)}
    assert present == families, f"families missing from driver window: {families - present}"
    # json/bson + engine/source/meta families use mixed prefixes:
    for needle in ("json", "bson", "engine_sql", "source_", "meta_"):
        assert any(needle in n for n in window), f"no {needle} query in driver window"


def test_tier1_names_exist():
    """Typo guard: every tier-1 priority name must resolve to a registered
    query (ddl_index_scan lands with the covered-index work)."""
    from phoenix_spark.queries import _TIER1

    missing = [n for n in _TIER1 if n not in QUERIES]
    assert missing in ([], ["ddl_index_scan"]), f"unknown tier-1 names: {missing}"


def test_readme_registry_count_in_sync():
    """Docs-sync pin (r6): the README's advertised entry count must match
    len(build_registry().queries) — the manifest, README, and SURVEY must
    tell the same story."""
    import re

    from phoenix_spark.queries import build_registry

    n = len(build_registry().queries)
    readme = open("README.md").read()
    m = re.search(r"(\d+) entries, ALL value-hash", readme)
    assert m, "README no longer states the registry entry count"
    assert int(m.group(1)) == n, f"README says {m.group(1)}, registry has {n}"


def test_verified_manifest_matches_correctness_files():
    """Manifest-accuracy pin (r7 advice): every name in _verified.ROUNDS[rN]
    must appear as a fully-green row (rows+schema+hash, no err) in the
    corresponding CORRECTNESS_r{N}.json, and every such green row must be in
    the manifest — the rotation's notion of "already verified" must never
    drift from the driver's actual record."""
    import json
    import os

    from phoenix_spark.queries._verified import ROUNDS

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rn, names in ROUNDS.items():
        path = os.path.join(here, f"CORRECTNESS_{rn}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rows = json.load(f)
        greens = {
            k
            for k, v in rows.items()
            if v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match") and not v.get("err")
        }
        assert names <= greens, f"{rn}: manifest lists non-green {sorted(names - greens)}"
        assert greens <= names, f"{rn}: green rows missing from manifest {sorted(greens - names)}"
