"""Reusable column-expression libraries (all JVM-side built-ins)."""
