"""Physical layout + lifecycle for the sink tables (SURVEY.md §4)."""
