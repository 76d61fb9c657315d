"""Document text extraction (SURVEY.md S2-S6).

The reference extracts text per file type — pypdf page-concat (S2),
python-docx paragraph join (S3), utf-8 read (S4), LLM-vision OCR for
images (S5) — dispatched on extension/MIME (S6,
``document_processing_service.py:20-140``).

Spark shape: a ``binaryFile``-source DataFrame (path, content) →
type-dispatch column → per-type Arrow-batched extractor UDFs.  The PDF
and DOCX kernels prefer pypdf / python-docx when installed (page-concat
/ paragraph-join, matching the reference) and otherwise fall back to
REAL stdlib parsers: DOCX is a zip of XML (``zipfile`` +
``ElementTree`` — a complete paragraph/run extraction with no external
dependency), and PDF text lives in content streams (plain or
FlateDecode, which ``zlib`` inflates) whose ``Tj``/``TJ`` operators the
fallback decodes — covers common plain/Flate PDFs (literal-string text
operators, ≤1 level of nested parens); hex strings, exotic filters,
and deeper nesting surface as a captured per-row error or partial
text.  Image OCR stays a stub by design
(external vision model, injected like every LLM stage).  TXT decoding
is real (and the only one exercised by the synthetic data).
"""

from __future__ import annotations

import io
import re
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Import gates, resolved once per process (worker-side too: the kernels
# run inside mapInPandas).  Tests monkeypatch these to fakes to exercise
# the library branch without the library.
try:  # pragma: no cover — absent in the test container
    from pypdf import PdfReader as _PdfReader
except ImportError:
    _PdfReader = None

try:  # pragma: no cover — absent in the test container
    from docx import Document as _DocxDocument
except ImportError:
    _DocxDocument = None

#: S6 dispatch table — extension → extractor kind
#: (``document_processing_service.py:20-24``).
SUPPORTED_TYPES = {
    ".txt": "txt",
    ".pdf": "pdf",
    ".docx": "docx",
    ".png": "image",
    ".jpg": "image",
    ".jpeg": "image",
}


def file_kind(path_col: Column) -> Column:
    """S6: extension dispatch as a when/otherwise column; unknown
    extensions map to 'unsupported' (the reference 415s them)."""
    ext = F.lower(F.regexp_extract(path_col, r"(\.[A-Za-z0-9]+)$", 1))
    expr: Column | None = None
    for suffix, kind in SUPPORTED_TYPES.items():
        cond = ext == suffix
        expr = F.when(cond, kind) if expr is None else expr.when(cond, kind)
    return expr.otherwise(F.lit("unsupported"))


def extract_txt(payload: bytes | None) -> str | None:
    """S4: utf-8 decode with replacement — the real kernel."""
    if payload is None:
        return None
    return bytes(payload).decode("utf-8", errors="replace")


#: PDF content stream bodies (plain or FlateDecode).
_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.S)
#: One PDF literal-string body: escapes, plus ONE level of balanced
#: unescaped nested parentheses (legal per spec; deeper nesting is rare
#: and documented as out of the fallback's scope).
_PDF_LIT_BODY = rb"(?:\\.|[^\\()]|\((?:\\.|[^\\()])*\))*"
#: Literal-string text operators inside a content stream, matched as one
#: alternation so ``Tj`` and ``TJ`` decode in STREAM ORDER.
_PDF_TEXTOP_RE = re.compile(
    rb"\((" + _PDF_LIT_BODY + rb")\)\s*Tj"
    rb"|\[((?:\\.|[^\]])*)\]\s*TJ"
)
_PDF_LIT_RE = re.compile(rb"\((" + _PDF_LIT_BODY + rb")\)")
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_literal(raw: bytes) -> str:
    """Decode a PDF literal string body: named escapes + octal escapes
    of 1-3 OCTAL digits (``\\8`` is a literal '8' per spec — only 0-7
    participate in the octal form)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if b"0" <= nxt <= b"7":
                j = i + 1
                while (
                    j < min(i + 4, len(raw))
                    and b"0" <= raw[j : j + 1] <= b"7"
                ):
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _PDF_ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _extract_pdf_stdlib(payload: bytes) -> str:
    """Best-effort pure-stdlib PDF text extraction: inflate FlateDecode
    content streams (``zlib``), decode every ``Tj`` / ``TJ`` literal in
    stream order.  Covers the plain/Flate PDFs that dominate generated
    documents; raises (→ per-row error capture) when no text operator
    is found, e.g. exotic filters or image-only pages."""
    parts: list[str] = []
    for m in _PDF_STREAM_RE.finditer(payload):
        data = m.group(1)
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass  # not Flate-compressed — treat as a plain stream
        chunks: list[str] = []
        for tm in _PDF_TEXTOP_RE.finditer(data):
            if tm.group(1) is not None:  # (…) Tj
                chunks.append(_pdf_literal(tm.group(1)))
            else:  # [ (…) kern (…) ] TJ
                for lm in _PDF_LIT_RE.finditer(tm.group(2)):
                    chunks.append(_pdf_literal(lm.group(1)))
        if chunks:
            parts.append("".join(chunks))
    if not parts:
        raise ValueError(
            "no text operators found (stdlib PDF fallback handles "
            "plain/FlateDecode content streams; install pypdf for full "
            "coverage or inject a kernel via extract_text(kernels=...))"
        )
    return "\n".join(parts)


def extract_pdf(payload: bytes | None) -> str | None:
    """S2: PDF page-text concat, newline-joined — the reference's PDF
    path (``document_processing_service.py:40-56``).  Uses pypdf when
    installed; otherwise the REAL stdlib fallback
    (:func:`_extract_pdf_stdlib`) parses plain/Flate content streams,
    raising only for encodings it cannot handle (captured per row)."""
    if payload is None:
        return None
    if _PdfReader is None:
        return _extract_pdf_stdlib(bytes(payload))
    reader = _PdfReader(io.BytesIO(bytes(payload)))
    return "\n".join((page.extract_text() or "") for page in reader.pages)


_DOCX_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _extract_docx_stdlib(payload: bytes) -> str:
    """Pure-stdlib OOXML extraction: a .docx is a zip whose
    ``word/document.xml`` holds paragraphs (``w:p``) of runs with text
    (``w:t``) — the same paragraph-join python-docx performs, with no
    external dependency."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = [
        "".join(t.text or "" for t in p.iter(f"{_DOCX_W}t"))
        for p in root.iter(f"{_DOCX_W}p")
    ]
    return "\n".join(paras)


def extract_docx(payload: bytes | None) -> str | None:
    """S3: DOCX paragraph join — the reference's DOCX path
    (``document_processing_service.py:58-75``).  Uses python-docx when
    installed; otherwise the REAL stdlib zip+XML parse
    (:func:`_extract_docx_stdlib`)."""
    if payload is None:
        return None
    if _DocxDocument is None:
        return _extract_docx_stdlib(bytes(payload))
    doc = _DocxDocument(io.BytesIO(bytes(payload)))
    return "\n".join(p.text for p in doc.paragraphs)


def extract_image_ocr(payload: bytes | None) -> str | None:
    """S5 stub: the reference calls an external vision model — an
    external-model stage, injected like every LLM stage (§2.12)."""
    raise NotImplementedError(
        "image OCR is an external-model stage; inject a client via "
        "extract_text(kernels=...)"
    )


DEFAULT_KERNELS: dict[str, Callable[[bytes | None], str | None]] = {
    "txt": extract_txt,
    "pdf": extract_pdf,
    "docx": extract_docx,
    "image": extract_image_ocr,
}


def extract_text(
    files: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    kernels: dict[str, Callable] | None = None,
) -> DataFrame:
    """binaryFile rows → (path, kind, text, extract_error).

    Errors are captured per row (kind kept, text null, error message
    column) rather than failing the job — ingest keeps flowing past bad
    files, which is the only sane behavior at 100 TB.
    """
    kernels = {**DEFAULT_KERNELS, **(kernels or {})}

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, errors = [], []
            for kind, payload in zip(pdf["kind"], pdf[content_col]):
                try:
                    fn = kernels.get(kind)
                    if fn is None:
                        raise ValueError(f"unsupported file kind {kind!r}")
                    texts.append(fn(payload))
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001 — per-row capture
                    texts.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "path": pdf[path_col],
                    "kind": pdf["kind"],
                    "text": texts,
                    "extract_error": errors,
                }
            )

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("extract_error", T.StringType()),
        ]
    )
    par = files.sparkSession.sparkContext.defaultParallelism
    prepared = files.select(
        F.col(path_col), F.col(content_col), file_kind(F.col(path_col)).alias("kind")
    ).repartition(par)
    return prepared.mapInPandas(_extract, schema)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S1 scan side: the binaryFile source (path, modificationTime,
    length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
