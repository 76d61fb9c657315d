"""Document text extraction (SURVEY.md S2-S6).

The reference extracts text per file type — pypdf page-concat (S2),
python-docx paragraph join (S3), utf-8 read (S4), LLM-vision OCR for
images (S5) — dispatched on extension/MIME (S6,
``document_processing_service.py:20-140``).

Spark shape: a ``binaryFile``-source DataFrame (path, content) →
type-dispatch column → per-type Arrow-batched extractor UDFs.  The PDF
and DOCX kernels are import-gated: when pypdf / python-docx are
installed they extract for real (page-concat / paragraph-join, matching
the reference); when absent (as in this container) they raise a clear
``NotImplementedError`` that ``extract_text`` captures per row, and
tests inject fake parsers to exercise the real branch.  Image OCR stays
a stub by design (external vision model, injected like every LLM stage).
TXT decoding is real (and the only one exercised by the synthetic data).
"""

from __future__ import annotations

import io
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


def extract_pdf(payload: bytes | None) -> str | None:
    """S2: pypdf page-text concat, newline-joined — the reference's PDF
    path (``document_processing_service.py:40-56``).  Import-gated:
    without pypdf this raises, which ``extract_text`` records as the
    row's ``extract_error``."""
    if payload is None:
        return None
    if _PdfReader is None:
        raise NotImplementedError(
            "pdf extraction requires pypdf; install it or inject a kernel "
            "via extract_text(kernels={'pdf': ...})"
        )
    reader = _PdfReader(io.BytesIO(bytes(payload)))
    return "\n".join((page.extract_text() or "") for page in reader.pages)


def extract_docx(payload: bytes | None) -> str | None:
    """S3: python-docx paragraph join — the reference's DOCX path
    (``document_processing_service.py:58-75``).  Import-gated like
    :func:`extract_pdf`."""
    if payload is None:
        return None
    if _DocxDocument is None:
        raise NotImplementedError(
            "docx extraction requires python-docx; install it or inject a "
            "kernel via extract_text(kernels={'docx': ...})"
        )
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
