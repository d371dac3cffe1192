"""Relational / dedup / similarity operators.

Generic DataFrame-in → DataFrame-out implementations of the reference's
analytics surface (SURVEY.md §2.3-2.6) plus the large-scale training-data
operators (dedup families, ANN, text analysis) that go beyond it.
"""
