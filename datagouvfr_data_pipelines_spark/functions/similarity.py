"""Vector-similarity column functions (embedding ANN surface).

Dot products / norms are built from ``zip_with`` + ``aggregate`` — JVM-side
sequential folds, deterministic and identical to a left-to-right C loop, so
results hash-match a DuckDB ``list_reduce`` oracle. No Python in the path.

Scale notes: brute-force top-k against a single probe vector is a map +
TakeOrdered — embarrassingly parallel, no shuffle. All-pairs search must NOT
be brute force at 100 TB: use the LSH-bucketed variant in operators/dedup.py
(same band-join pattern as MinHash) or IVF (cluster-assign then search within
cells).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right fold dot product in double."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double; 0.0 on zero-norm vectors."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(d / (na * nb))


def ivf_cell(a: Column | str, n_cells: int = 64) -> Column:
    """Cheap IVF-style cell assignment: sign-bits of the first log2(n) dims.

    A deterministic stand-in for k-means centroids that needs no training
    pass: bucket by the sign pattern of leading components. Used to restrict
    ANN search to one cell (plus neighbors) instead of the full corpus.
    """
    import math

    bits = int(math.log2(n_cells))
    v = _col(a)
    cell = F.lit(0)
    for i in range(bits):
        cell = cell * 2 + F.when(F.element_at(v, i + 1) >= 0, 1).otherwise(0)
    return cell.cast("int")
