"""Relational operator core (SURVEY.md §2.2-2.7)."""
