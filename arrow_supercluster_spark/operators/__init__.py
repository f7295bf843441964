"""Operators — DataFrame→DataFrame transformations (SURVEY.md §2)."""
