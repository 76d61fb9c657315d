"""Structured Streaming variants of the batch pipelines (SURVEY.md §2.11)."""


def await_or_raise(query, timeout_s: int, what: str = "stream") -> None:
    """Bounded wait that is LOUD on timeout even under ``python -O``:
    a bare ``assert q.awaitTermination(...)`` is stripped by ``-O``,
    silently restoring the partial-result-on-timeout bug the check
    exists to prevent (ADVICE r8)."""
    if not query.awaitTermination(timeout_s):
        raise RuntimeError(f"{what} timed out after {timeout_s}s")
