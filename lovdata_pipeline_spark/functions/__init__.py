"""Scalar / vectorized function library (JVM-first, pandas-UDF fallback)."""
