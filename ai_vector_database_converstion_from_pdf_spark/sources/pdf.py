"""I1/I13 — PDF sources.

I1 (local layout extraction): `spark.read.format("binaryFile")` over PDF
paths → mapInPandas decode emitting per-char boxes, the input to
operators/ingest.chars_to_lines. Two decode backends, resolved per
executor batch: pypdfium2 (full PDFium fidelity) when installed, else
the dependency-free `minipdf` parser (public PDF-spec subset: plain or
FlateDecode content streams, classic text operators) — enough to run
real machine-generated PDFs end-to-end in this container; see
tests/test_pdf_e2e.py for the full I1-I10 proof on a real file.

Reference: `PdfProcessor::extractChunksAsync` (`pdf_processor.cpp:23-95`)
— single-threaded PDFium loop; here each PDF decodes independently in a
partition (docs are the parallel unit at 100 TB).

I13 (cloud OCR, `gemini_api.cpp:275-314`): `read_pdf_ocr_text` posts each
PDF to a functions.providers.HttpOcrProvider (Gemini generateContent wire
shape) from inside a mapInPandas pass — one POST per document, documents
parallel across partitions — yielding (doc, text) rows that feed the
same downstream DAG as any text source (chunker → embed → index). Out of
the oracle correctness path (network); mock-server-tested in
tests/test_http_providers.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CHAR_SCHEMA = (
    "doc string, page int, left double, top double, right double, "
    "bottom double, ch string, font_size double, font_weight int"
)


def read_pdf_ocr_text(
    spark: SparkSession, path_glob: str, provider
) -> DataFrame:
    """I13 — cloud-OCR PDF source (`GeminiApi::processPdf`,
    `gemini_api.cpp:275-314`): binaryFile scan → one provider.ocr() POST
    per document from inside mapInPandas (documents are the parallel
    unit; the provider object pickles into the closure like the HTTP
    embedder). Returns (doc, text) — the same shape as any text source,
    so the output feeds the standard chunk→embed→index DAG. `provider`
    is a functions.providers.HttpOcrProvider (or any object with
    `.ocr(bytes) -> str`)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def ocr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "doc": pdf["path"].values,
                    "text": [provider.ocr(bytes(c)) for c in pdf["content"]],
                }
            )

    return files.mapInPandas(ocr, "doc string, text string")


def have_pdfium() -> bool:
    try:
        import pypdfium2  # noqa: F401

        return True
    except ImportError:
        return False


def read_pdf_chars(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → per-char boxes. Requires pypdfium2 at executor
    import time; raises cleanly when absent."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import pypdfium2 as pdfium
        except ImportError:
            from . import minipdf

            for pdf in batches:
                rows: list[dict] = []
                for r in pdf.itertuples(index=False):
                    rows.extend(minipdf.extract_chars(bytes(r.content), r.path))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc", "page", "left", "top", "right", "bottom",
                        "ch", "font_size", "font_weight",
                    ],
                )
            return
        for pdf in batches:
            rows = {k: [] for k in (
                "doc", "page", "left", "top", "right", "bottom", "ch",
                "font_size", "font_weight")}
            for r in pdf.itertuples(index=False):
                doc = pdfium.PdfDocument(bytes(r.content))
                for pno in range(len(doc)):
                    page = doc[pno]
                    tp = page.get_textpage()
                    for i in range(tp.count_chars()):
                        l, b, rr, t = tp.get_charbox(i)
                        rows["doc"].append(r.path)
                        rows["page"].append(pno + 1)
                        rows["left"].append(l)
                        rows["top"].append(t)
                        rows["right"].append(rr)
                        rows["bottom"].append(b)
                        rows["ch"].append(tp.get_text_range(i, 1))
                        rows["font_size"].append(12.0)  # pypdfium2 lacks per-char size API parity
                        rows["font_weight"].append(400)
            yield pd.DataFrame(rows)

    return files.mapInPandas(decode, CHAR_SCHEMA)
