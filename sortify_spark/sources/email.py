"""Email ingestion (SURVEY.md S7/S8, F17).

The reference's Gmail connector pages ``users.messages.list`` (≤100 per
page), parses headers/body/attachments, strips HTML, and batch-imports
messages as document rows (``gmail_service.py:103-398``,
``apis/v1/gmail.py:749-844``).  The external API client is out of engine
scope; what the engine owns is everything after the fetch: parsing raw
messages into a typed staging table and folding it into the documents
table.  HTML-to-text is a pure JVM expression (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def html_to_text(col: Column | str) -> Column:
    """F17: tag-strip + entity-decode + whitespace-collapse, all
    ``regexp_replace`` (JVM-side; reference uses an HTMLParser subclass,
    ``gmail_service.py:30-76``).  Script/style blocks drop with their
    content."""
    c = F.col(col) if isinstance(col, str) else col
    # Separate script/style patterns (no backreference) — RE2-compatible,
    # so the same pattern works in the DuckDB oracle.
    no_blocks = F.regexp_replace(
        F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " "),
        r"(?is)<style[^>]*>.*?</style>",
        " ",
    )
    no_tags = F.regexp_replace(no_blocks, r"<[^>]+>", " ")
    decoded = no_tags
    for ent, rep in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        decoded = F.regexp_replace(decoded, ent, rep)
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


def parse_raw_emails(raw: DataFrame, raw_col: str = "raw") -> DataFrame:
    """S7 parse stage: RFC-822-ish raw text → typed staging rows
    (message_id, subject, sender, date_s, body_text).

    Header extraction is regexp over the head section; the body is
    everything past the first blank line, HTML-stripped.  All JVM
    expressions — at 100 TB this stage is a pure narrow map over the
    fetched blobs.
    """
    c = F.col(raw_col)
    head = F.regexp_extract(c, r"(?s)^(.*?)\r?\n\r?\n", 1)
    body = F.regexp_replace(c, r"(?s)^.*?\r?\n\r?\n", "")

    def header(name: str) -> Column:
        return F.regexp_extract(head, rf"(?im)^{name}:\s*(.*)$", 1)

    return raw.select(
        header("Message-ID").alias("message_id"),
        header("Subject").alias("subject"),
        header("From").alias("sender"),
        header("To").alias("recipient"),
        header("Date").alias("date_s"),
        html_to_text(body).alias("body_text"),
    )


def parse_attachments(raw: DataFrame, raw_col: str = "raw") -> DataFrame:
    """S7 attachment stage: MIME multipart metadata, one row per
    attachment — ``(message_id, att_filename, att_content_type,
    att_size_bytes)``.

    The reference walks ``payload.parts`` collecting filename / mimeType
    / body size (``gmail_service.py:330-398``).  Here the raw message is
    split on its declared MIME boundary (per-row regex split — all JVM
    expressions, no UDF), each part's headers are regexp-parsed, and the
    decoded size is estimated from the base64 payload length (3/4 of the
    b64 characters, padding-adjusted).  Parts without an attachment
    disposition (inline bodies) are dropped.  Folded (multi-line)
    filename headers are out of scope, matching the reference's use of
    the pre-flattened API field.
    """
    c = F.col(raw_col)
    head = F.regexp_extract(c, r"(?s)^(.*?)\r?\n\r?\n", 1)
    mid = F.regexp_extract(head, r"(?im)^Message-ID:\s*(.*)$", 1)
    boundary = F.regexp_extract(head, r'(?i)boundary="?([^";\r\n]+)"?', 1)
    # The boundary is data used as a regex — escape metacharacters first.
    esc = F.regexp_replace(boundary, r"([.*+?^${}()|\[\]\\])", r"\\$1")
    parts = F.split(c, F.concat(F.lit("--"), esc))
    exploded = raw.select(
        mid.alias("message_id"),
        F.explode(parts).alias("part"),
    ).filter(
        F.col("part").rlike(r"(?i)content-disposition:\s*attachment")
    )
    payload = F.regexp_extract(F.col("part"), r"(?s)\r?\n\r?\n(.*)$", 1)
    b64 = F.regexp_replace(payload, r"[^A-Za-z0-9+/=]", "")
    pad = F.length(F.regexp_extract(b64, r"(=*)$", 1))
    return exploded.select(
        "message_id",
        F.regexp_extract(
            F.col("part"),
            r'(?i)content-disposition:\s*attachment;[^\r\n]*filename="?([^";\r\n]+)"?',
            1,
        ).alias("att_filename"),
        F.regexp_extract(
            F.col("part"), r"(?i)content-type:\s*([^;\s]+)", 1
        ).alias("att_content_type"),
        (F.length(b64) * 3 / 4 - pad).cast("long").alias("att_size_bytes"),
    )


def emails_to_documents(
    parsed: DataFrame, owner_id: str = "default"
) -> DataFrame:
    """S8 batch import: staging rows → document-table rows with email
    provenance columns (``apis/v1/gmail.py:749-844`` sets
    email_source/email_metadata)."""
    return parsed.select(
        F.coalesce(
            F.nullif(F.col("message_id"), F.lit("")),
            F.concat(F.lit("email-"), F.md5(F.col("body_text").cast("binary"))),
        ).alias("_id"),
        F.col("subject").alias("filename"),
        F.lit("email").alias("file_type"),
        F.length("body_text").cast("long").alias("size"),
        F.lit(owner_id).alias("owner_id"),
        F.lit("UPLOADED").alias("status"),
        F.lit("not_vectorized").alias("vector_status"),
        F.col("body_text").alias("extracted_text"),
        F.lit("gmail").alias("email_source"),
        F.create_map(
            F.lit("sender"), F.col("sender"),
            F.lit("recipient"), F.col("recipient"),
            F.lit("date"), F.col("date_s"),
        ).alias("email_metadata"),
        F.current_timestamp().alias("email_synced_at"),
    )
