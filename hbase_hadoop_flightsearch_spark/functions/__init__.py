"""Placeholder — populated in build phases (SURVEY.md §7)."""
