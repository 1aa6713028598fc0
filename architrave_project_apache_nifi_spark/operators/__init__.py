"""Operator library: each module re-expresses a reference capability
(SURVEY.md §2) or a driver-mandated extension (§2.9) as native
DataFrame transformations.
"""
