"""Source-level integrity checks for the query/oracle registries.

Python silently collapses duplicate dict-literal keys, so a
copy-paste duplicate in ``QUERIES`` shrinks the registry and shifts
every later entry's slot in the 50-query driver verification window
without any runtime error.  These tests parse the SOURCE with
``ast`` so duplicates fail loudly.
"""
from __future__ import annotations

import ast
import inspect
from collections import Counter

import ons_utils_spark.plans.queries as qmod
from ons_utils_spark.plans.queries import ORACLES, QUERIES


def _dict_literal_keys(var_name: str) -> list:
    tree = ast.parse(inspect.getsource(qmod))
    for node in ast.walk(tree):
        if (isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.target.id == var_name
                and isinstance(node.value, ast.Dict)):
            return [k.value for k in node.value.keys
                    if isinstance(k, ast.Constant)]
    raise AssertionError(f'{var_name} dict literal not found')


def test_queries_has_no_duplicate_keys():
    keys = _dict_literal_keys('QUERIES')
    dupes = [k for k, n in Counter(keys).items() if n > 1]
    assert not dupes, f'duplicate QUERIES keys: {dupes}'
    assert len(keys) == len(QUERIES)


def test_oracles_has_no_duplicate_keys():
    keys = _dict_literal_keys('ORACLES')
    dupes = [k for k, n in Counter(keys).items() if n > 1]
    assert not dupes, f'duplicate ORACLES keys: {dupes}'
    assert len(keys) == len(ORACLES)


def test_every_oracle_has_a_query():
    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f'oracles without queries: {sorted(orphans)}'


def test_rows_only_queries_are_documented():
    # Queries lacking an oracle get only the weaker rows-only driver
    # check; keep that set deliberate and small.
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert len(rows_only) <= 4, (
        f'rows-only set grew: {rows_only} — add DuckDB oracles')
