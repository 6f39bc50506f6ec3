"""Reusable DataFrame->DataFrame operators.

Each operator is a pure function so it composes into plans and is
independently testable (SURVEY.md §7.0 design stance).
"""
