"""DuckDB-oracle differential test over every registered query
(SURVEY.md §5.2 item 1) — the same comparison the driver runs at t2:
row count + column names + order-insensitive values, at sf0.01.

Rows-only queries (oracle=None) are still executed to assert they run
and return a stable schema; their value-level checks live in dedicated
test modules (self-oracles, SURVEY §5.3).
"""

from __future__ import annotations

import pytest

from embarrassingly_parallel_image_classification_spark import registry
from tests.conftest import SF_T2, assert_matches_oracle


def _specs():
    return sorted(registry.specs().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    if spec.oracle is None:
        df = spec.fn(spark, SF_T2)
        assert df.columns, f"{spec.name}: no columns"
        assert df.count() >= 0
    else:
        assert_matches_oracle(spark, duck, spec.name, spec.fn, spec.oracle, SF_T2)
