"""Full query-registry parity vs DuckDB at sf0.001 — the same check the
driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

import pytest

from tests.oracle_harness import compare_query, duck_connection


def _registry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry
    return entry._registry()


@pytest.mark.parametrize("name", sorted(_registry().keys()))
def test_query_matches_oracle(ray_session, sf_small, name):
    fn, sql = _registry()[name]
    result = compare_query(name, fn, sql, sf_small)
    assert result["rows"] >= 0
    if sql is not None:
        assert result["match"], f"{name}: {result['detail']}"
