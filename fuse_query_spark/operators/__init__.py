"""Large-scale data-pipeline operators (dedup, similarity, text
analysis, multimodal plumbing) — the capabilities a 100 TB training-
data pipeline needs on top of the reference's SQL surface.

All hot paths are JVM-side (built-in pyspark.sql.functions inside
whole-stage codegen); Python appears only in deterministic plane
generation (driver-side constants) and clearly-marked multimodal
stubs.
"""
