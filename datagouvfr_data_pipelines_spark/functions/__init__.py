"""Scalar/column function library — pure ``pyspark.sql.functions`` builders."""
