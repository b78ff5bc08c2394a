"""Physical-plan introspection utilities."""

from cudf_spark.plans.audit import scale_audit  # noqa: F401
