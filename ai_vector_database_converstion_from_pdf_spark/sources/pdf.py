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

I13 (cloud OCR, `gemini_api.cpp:275-314`) is a provider UDF slot like the
embedder — out of the correctness path, stub only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CHAR_SCHEMA = (
    "doc string, page int, left double, top double, right double, "
    "bottom double, ch string, font_size double, font_weight int"
)


def ocr_pdf_provider(pdf_bytes: bytes, prompt: str = "Extract all text") -> str:
    """I13 — cloud OCR provider slot (`GeminiApi::processPdf`,
    `gemini_api.cpp:275-314`: base64 the whole PDF into a generateContent
    call). Out of the correctness path (SURVEY §2.1); a deployment wires
    a real multimodal-LLM client here. Raises by contract when unset."""
    raise NotImplementedError(
        "cloud OCR requires a configured multimodal provider; "
        "the local layout pipeline (read_pdf_chars -> operators/ingest) "
        "is the correctness path"
    )


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
