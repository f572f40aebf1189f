"""Scalar function library (reference O5/O7/O9/O11 + extensions)."""
