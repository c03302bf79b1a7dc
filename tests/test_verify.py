"""Unit tests for verify.py — the model of the driver's exact value
hash. These pin the exact dtype semantics that round 1 got wrong:
int-vs-float must DIFFER, engine null spellings must UNIFY, and
incidental representation noise (-0.0, numpy scalar types, array
containers) must normalize away. No SparkSession needed."""

from __future__ import annotations

import numpy as np
import pandas as pd

from embarrassingly_parallel_image_classification_spark.verify import (
    canon_cell,
    diff_exact,
    normalize_exact,
)


def test_int_float_distinct():
    # The round-1 failure class: DuckDB epoch() DOUBLE vs Spark BIGINT.
    assert canon_cell(1704067207) != canon_cell(1704067207.0)


def test_numpy_and_python_scalars_agree():
    assert canon_cell(np.int64(42)) == canon_cell(42)
    assert canon_cell(np.float64(42.5)) == canon_cell(42.5)
    assert canon_cell(np.bool_(True)) == canon_cell(True)


def test_null_spellings_unify():
    assert canon_cell(None) == canon_cell(float("nan")) == canon_cell(pd.NaT) == "NULL"


def test_negative_zero_collapses():
    assert canon_cell(-0.0) == canon_cell(0.0)


def test_list_and_ndarray_agree():
    # Spark returns numpy arrays, DuckDB returns Python lists.
    assert canon_cell([1, 2, 3]) == canon_cell(np.array([1, 2, 3]))


def test_bytes_hex():
    assert canon_cell(b"\x01\xff") == "01ff"


def test_diff_exact_catches_dtype_mismatch():
    got = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    want = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    assert diff_exact(got, want) is not None


def test_diff_exact_order_and_column_order_insensitive():
    got = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    want = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert diff_exact(got, want) is None


def test_diff_exact_no_tolerance():
    # atol=1e-5 would have passed this; the driver hash does not.
    got = pd.DataFrame({"v": [1.000001]})
    want = pd.DataFrame({"v": [1.000002]})
    assert diff_exact(got, want) is not None


def test_normalize_sorts_rows_stringly_but_deterministically():
    pdf = pd.DataFrame({"v": [10, 2, 1]})
    out = normalize_exact(pdf)
    assert list(out["v"]) == sorted(["10", "2", "1"])


def test_diff_exact_catches_dropped_and_duplicated_rows():
    base = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    dropped = base.iloc[:2]
    assert diff_exact(dropped, base) is not None
    duplicated = pd.concat([base, base.iloc[[0]]], ignore_index=True)
    assert diff_exact(duplicated, base) is not None


def test_diff_exact_catches_cross_column_value_swap():
    """Order-insensitive comparison must still be COLUMN-sensitive: the
    same multiset of values distributed differently across columns is a
    different answer (the failure a bad join key produces)."""
    got = pd.DataFrame({"a": [1, 4], "b": [3, 2]})
    want = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    assert diff_exact(got, want) is not None


def test_diff_exact_catches_cross_row_pairing_change():
    """Values re-paired across rows (right totals, wrong grouping) must
    fail: row identity is the whole tuple, not per-column multisets."""
    got = pd.DataFrame({"k": ["a", "b"], "v": [2, 1]})
    want = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    assert diff_exact(got, want) is not None
