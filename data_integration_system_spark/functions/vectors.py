"""Vector math over `array<float>` columns — pure higher-order functions.

Everything here stays JVM-side (`zip_with`/`aggregate` compile into
codegen'd loops over the array) — no Python round-trip, which is what
makes brute-force similarity viable at scale: the dot product runs inside
the join stage, vectorized over parquet-decoded arrays.

Accumulation is in DOUBLE regardless of the array element type so results
are stable and comparable with a float64 oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL)."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n)
