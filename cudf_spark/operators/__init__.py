"""Composite operators the reference implements as native kernels and Spark
lacks as single primitives — each built as a composition of DataFrame ops
(shuffle-aware, no driver-side loops)."""
