"""Scalar function layer: NiFi Expression Language and Jolt DSL
equivalents as native Spark Column expressions (SURVEY.md §2.3).
"""
