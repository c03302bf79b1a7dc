"""Exact cross-engine result comparison — the model of the driver's hash.

The driver compares Spark vs DuckDB results with an EXACT, dtype-sensitive
value hash: ``1704067207.0`` (DOUBLE) and ``1704067207`` (BIGINT) are
different values even though they're numerically equal. Round 1 shipped
three hash failures precisely because the local harness compared with
``check_dtype=False, atol=1e-5`` after float64-coercion — strictly weaker
than the driver. This module is the strict replacement: every cell is
rendered to a canonical string that PRESERVES the int/float distinction,
rows are sorted, and frames must match exactly. Local green here is meant
to predict driver green.

Normalization rules (mirroring what survives the driver's hash):
  * columns sorted by name; rows sorted by all columns (stable, stringly);
  * ints render bare (``42``), floats with their repr (``42.0``) — the
    dtype classes the driver distinguishes;
  * NaN/None/NaT all render ``NULL`` (both engines surface SQL NULL
    through pandas as one of these);
  * list/array cells render element-wise recursively (numpy arrays and
    Python lists identically); dicts as sorted item lists; bytes as hex;
  * -0.0 renders as 0.0 (engines disagree on signed zero of a SUM that
    cancels; SQL says -0.0 = 0.0).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def canon_cell(v) -> str:
    """Canonical, dtype-faithful string for one result cell."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f == 0.0:  # collapse -0.0 / +0.0
            f = 0.0
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return "true" if v else "false"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def normalize_exact(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical all-string frame: sorted columns, sorted rows, exact cells."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = {}
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.astype(str).where(col.notna(), "NULL")
        else:
            out[c] = col.map(canon_cell)
    res = pd.DataFrame(out, dtype=str)
    if len(res):
        res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(
            drop=True
        )
    return res


def diff_exact(got: pd.DataFrame, want: pd.DataFrame, max_examples: int = 5) -> str | None:
    """None if the normalized frames match exactly, else a short report."""
    g, w = normalize_exact(got), normalize_exact(want)
    if list(g.columns) != list(w.columns):
        return f"columns differ: spark={list(g.columns)} oracle={list(w.columns)}"
    if len(g) != len(w):
        return f"row count differs: spark={len(g)} oracle={len(w)}"
    neq = (g != w).any(axis=1)
    if not neq.any():
        return None
    n = int(neq.sum())
    lines = [f"{n}/{len(g)} rows differ (exact, dtype-sensitive):"]
    for i in g.index[neq][:max_examples]:
        for c in g.columns:
            if g.at[i, c] != w.at[i, c]:
                lines.append(f"  row {i} col {c}: spark={g.at[i, c]!r} oracle={w.at[i, c]!r}")
    return "\n".join(lines)
