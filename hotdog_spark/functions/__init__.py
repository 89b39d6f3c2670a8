"""Scalar column-expression helpers (JVM-side wherever possible)."""
