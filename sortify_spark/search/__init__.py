"""Vector top-k + rank-fusion search pipelines (SURVEY.md §2.10)."""
