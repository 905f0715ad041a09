"""Replay the driver's oracle gate locally at sf0.001: every registered
query with an oracle must hash-match DuckDB (SURVEY.md §5 test plan #1)."""

from __future__ import annotations

import pytest

from pulsar_sync_java_spark.queries import all_oracles, all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLES:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    assert_matches_oracle(spark, duck, df, _ORACLES[name])
