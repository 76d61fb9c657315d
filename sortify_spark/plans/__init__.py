"""Dynamic query-spec compilation (SURVEY.md P8, §1.5)."""
