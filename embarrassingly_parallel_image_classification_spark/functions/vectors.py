"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

The embedding column (FIXTURES.md) is the engine's stand-in for the
reference's image-feature tensors. All kernels here are higher-order
array functions (zip_with / aggregate / transform): they execute in the
JVM with no Python crossing and no UDF registration, so they compose
freely with joins/windows and stay inside whole-stage codegen spans.

Accumulation is in DOUBLE regardless of the input element type —
float32 accumulation over 100 TB would drift; casting per-element costs
nothing measurable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fsum(arr: str | Column) -> Column:
    """Σ xᵢ in double, left-to-right (matches an UNNEST-order SQL SUM)."""
    return F.aggregate(
        _c(arr), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def dot(a: str | Column, b: str | Column) -> Column:
    """⟨a, b⟩ in double precision."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str | Column) -> Column:
    """‖a‖₂."""
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_dist_sq(a: str | Column, b: str | Column) -> Column:
    """‖a − b‖² (squared — monotone for nearest-neighbor ranking, no sqrt)."""
    return F.aggregate(
        F.zip_with(
            _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def scale(a: str | Column, s: float | Column) -> Column:
    """s · a (element-wise), double elements."""
    s = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(_c(a), lambda x: x.cast("double") * s)


def unit(a: str | Column) -> Column:
    """a / ‖a‖ — unit-normalized copy (double elements)."""
    return scale(a, F.lit(1.0) / F.nullif(norm(a), F.lit(0.0)))
