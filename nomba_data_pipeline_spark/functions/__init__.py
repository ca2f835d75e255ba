"""Scalar / text / time column-expression helpers.

Everything here is built from `pyspark.sql.functions` (JVM-side,
whole-stage-codegen friendly). No row-at-a-time Python UDFs.
"""
