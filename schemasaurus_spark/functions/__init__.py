"""Scalar-function helpers: format-regex registry, portable hashing."""
