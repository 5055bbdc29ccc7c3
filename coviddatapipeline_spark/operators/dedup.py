"""Placeholder — populated in M3 (see SURVEY.md §7.4)."""
