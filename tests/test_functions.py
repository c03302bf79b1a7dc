"""Self-oracles for the scalar-function surface (functions/scalar.py)
— pure-Python recomputation at sf0.001, independent of both Spark and
the DuckDB oracle strings (the test_stats.py twin discipline)."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE




def test_luhn_matches_brute_force(spark):
    """The builtin luhn_check, the check-digit generator and the
    tamper branch replayed against a from-definition Python Luhn over
    the same synthetic account numbers."""
    from embarrassingly_parallel_image_classification_spark import registry

    got = (
        registry.queries()["q_fn_luhn"](spark, SF_SMOKE)
        .toPandas()
        .set_index("seg")
    )
    rows = duckdb.sql(
        f"SELECT c_mktsegment seg, c_custkey ck, c_nationkey nk"
        f" FROM read_parquet('{SF_SMOKE}/customer.parquet')"
    ).fetchall()

    def luhn_sum(d, shift):
        s = 0
        for p in range(1, len(d) + 1):
            g = int(d[p - 1])
            if (len(d) - p + shift) % 2 == 1:
                g = 2 * g - 9 if 2 * g > 9 else 2 * g
            s += g
        return s

    from collections import defaultdict

    n = defaultdict(int)
    n_valid = defaultdict(int)
    for seg, ck, nk in rows:
        d = str(ck).zfill(9) + str(nk).zfill(2)
        n[seg] += 1
        if luhn_sum(d, 0) % 10 == 0:
            n_valid[seg] += 1
        base = d[:-1]
        c = (10 - luhn_sum(base, 1) % 10) % 10
        assert luhn_sum(base + str(c), 0) % 10 == 0
        assert luhn_sum(base + str((c + 5) % 10), 0) % 10 != 0
    for seg in n:
        assert int(got.loc[seg, "n"]) == n[seg]
        assert int(got.loc[seg, "n_valid"]) == n_valid[seg]
        assert int(got.loc[seg, "n_synth_valid"]) == n[seg]
        assert int(got.loc[seg, "n_tampered_valid"]) == 0
