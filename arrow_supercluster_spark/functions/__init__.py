"""Scalar expression library — pure Column→Column functions (JVM-side,
whole-stage-codegen friendly; no Python UDFs anywhere in this package)."""
