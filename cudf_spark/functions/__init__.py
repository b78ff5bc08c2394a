"""Scalar-function shims mirroring libcudf semantics where Spark's builtin
differs or is missing (SURVEY.md §2.8-2.10 'custom expressions' list).

All shims are pure Column expressions (JVM-side, whole-stage-codegen'd) —
no Python UDFs in this package.
"""
