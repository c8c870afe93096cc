"""Vector expressions over ``array<float>`` embedding columns.

Fast path: higher-order functions (``zip_with`` + ``aggregate``) — a
sequential JVM-side fold, no explode, no Python. Exact path (used where a
bit-reproducible result must match the DuckDB oracle): posexplode +
decimal-summed dot products, which are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    """JVM-side dot product: fold over zip_with, doubles."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))
