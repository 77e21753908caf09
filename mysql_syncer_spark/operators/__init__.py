"""Dataflow operators: the Spark-first re-expression of the reference's
CDC stages (SURVEY §2) plus the scale operators the reference lacks (§2.7).
"""
