"""Vector column math over array<float> embeddings (JVM-side, no UDF).

`zip_with`/`aggregate` higher-order expressions — fine here because each is
evaluated once per row (unlike the K-fold minhash case, see
operators/linking.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))
