"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from daft_spark.queries import all_queries
from tests.conftest import SF_DIR, assert_frames_match

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, ducks):
    spec = QUERIES[name]
    df = spec.spark_fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check (same as the driver's weaker path) — must be
        # non-vacuous: a 0-row result proves nothing
        assert df.count() > 0, f"{name} returned 0 rows (vacuous check)"
        return
    assert df.limit(1).count() > 0, f"{name} returned 0 rows (vacuous oracle match)"
    assert_frames_match(df, ducks, spec.oracle)
