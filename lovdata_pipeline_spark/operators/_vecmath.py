"""Vectorized (Arrow-batched) twins of the JVM higher-order vector
folds in ``similarity._dot`` / ``similarity._norm``.

The expression forms run INTERPRETED per row (Catalyst higher-order
functions never enter whole-stage codegen), which made every
pair-cosine operator scoring-bound at bench scale (guide §4.2: hand
whole batches to vectorized native code). These twins keep the graded
cross-engine parity contract: every accumulation runs in the SAME
IEEE-754 operation sequence as the fold they replace —

- ``pair_dot(a, b)``  ==  aggregate(zip_with(a, b, x*y), 0.0, s+x):
  products added in dimension order;
- ``vec_norm(a)``     ==  sqrt(aggregate(a, 0.0, s + x*x)):
  squares added in dimension order, then one correctly-rounded sqrt —

so scores are bit-identical to the expression form (verified
value-level per call site, OPTIMIZATION_r14.md). float64 elementwise
ops and np.sqrt are IEEE-defined; only the ACCUMULATION ORDER could
diverge, and the per-dimension loops below pin it.

NULL vectors become NaN scores here where the JVM yields NULL; every
call site filters on ``norm > 0`` (false for both NaN and NULL), so
the surviving rows — and their values — are identical.

NOTE: this module must NOT import ``annotations`` from __future__ —
``pandas_udf`` resolves the type hints at decoration time, and string
annotations would break it (the bench.py warmup comment documents the
same gotcha).
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType


def _stack(s: pd.Series) -> np.ndarray:
    """Series-of-arrays → (N, D) float64 matrix; NULL rows become NaN
    rows (the norm filter drops them, see module docstring)."""
    if len(s) == 0:
        return np.empty((0, 0), dtype=np.float64)
    vals = s.to_numpy()
    nulls = [i for i, v in enumerate(vals) if v is None]
    if nulls:
        probe = next((v for v in vals if v is not None), None)
        d = len(probe) if probe is not None else 1
        out = np.full((len(vals), d), np.nan, dtype=np.float64)
        for i, v in enumerate(vals):
            if v is not None:
                out[i] = np.asarray(v, dtype=np.float64)
        return out
    return np.vstack(vals).astype(np.float64, copy=False)


@F.pandas_udf(DoubleType())
def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Raw (un-rounded) dot of two array columns, fold-order exact."""
    va, vb = _stack(a), _stack(b)
    acc = np.zeros(va.shape[0], dtype=np.float64)
    for i in range(va.shape[1]):
        acc = acc + va[:, i] * vb[:, i]
    return pd.Series(acc)


@F.pandas_udf(DoubleType())
def vec_norm(a: pd.Series) -> pd.Series:
    """L2 norm of an array column, fold-order exact."""
    va = _stack(a)
    acc = np.zeros(va.shape[0], dtype=np.float64)
    for i in range(va.shape[1]):
        acc = acc + va[:, i] * va[:, i]
    return pd.Series(np.sqrt(acc))


@F.pandas_udf(DoubleType())
def pair_neg_sq_l2(a: pd.Series, b: pd.Series) -> pd.Series:
    """−Σ(aᵢ−bᵢ)², squares added in dimension order — the bit-exact
    twin of ``-aggregate(zip_with(a, b, (x−y)²), 0.0, s+x)``."""
    va, vb = _stack(a), _stack(b)
    acc = np.zeros(va.shape[0], dtype=np.float64)
    for i in range(va.shape[1]):
        d = va[:, i] - vb[:, i]
        acc = acc + d * d
    return pd.Series(-acc)


def nearest_cell(centroids):
    """Factory: a pandas UDF assigning each vector its nearest centroid
    index — the bit-exact twin of ``ivf_assign``'s struct ``array_min``
    (sequential-fold squared L2 per cell; ties to the LOWER cell index,
    matching both the struct ordering and np.argmin's first-match).
    NULL vectors yield NULL cells."""
    cents = [np.asarray(c, dtype=np.float64) for c in centroids]

    @F.pandas_udf(IntegerType())
    def _assign(v: pd.Series) -> pd.Series:
        m = _stack(v)
        dists = np.empty((m.shape[0], len(cents)), dtype=np.float64)
        for j, c in enumerate(cents):
            acc = np.zeros(m.shape[0], dtype=np.float64)
            for i in range(m.shape[1]):
                d = m[:, i] - c[i]
                acc = acc + d * d
            dists[:, j] = acc
        cells = np.argmin(dists, axis=1).astype("float64")
        bad = np.isnan(dists).any(axis=1)
        out = pd.Series(cells)
        if bad.any():
            out[bad] = None
        return out

    return _assign


# Call sites filter on the norm/score column and then reuse it; the
# optimizer would otherwise evaluate the UDF once below the pushed
# filter and again in the projection (guide §4.4 — two ArrowEvalPython
# nodes for one column). Nondeterministic marking pins a single
# evaluation; the functions are of course deterministic — the flag only
# forbids the optimizer from duplicating/reordering them.
vec_norm_once = vec_norm.asNondeterministic()
pair_dot_once = pair_dot.asNondeterministic()
