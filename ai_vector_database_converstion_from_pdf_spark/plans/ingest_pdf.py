"""The composed I1-I10 ingest plan: PDF files → retrieval-ready chunks.

Reference: `PdfProcessor::extractChunksAsync` (`pdf_processor.cpp:23-406`)
runs this as one sequential loop per PDF; here each stage is a DataFrame
op whose parallel unit is the (doc, page) or doc group, so a million PDFs
ingest as wide as the cluster. Pipeline:

  read_pdf_chars (I1, binaryFile + decode backend)
    → chars_to_lines (I4)
    → filter_noise_lines (I2 header/footer freq + I3 bare page numbers)
    → two_column_order (I5)
    → lines_to_blocks (I6)
    → baseline_font (I7) ⊕ chunk_documents (I8-I11 inside the chunker)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.ingest import (
    baseline_font,
    chars_to_lines,
    chunk_documents,
    filter_noise_lines,
    lines_to_blocks,
    two_column_order,
)
from ..sources.pdf import read_pdf_chars

US_LETTER_W = 612.0
US_LETTER_H = 792.0


def pdf_to_chunks(
    spark: SparkSession,
    path_glob: str,
    page_width: float = US_LETTER_W,
    page_height: float = US_LETTER_H,
) -> DataFrame:
    """(doc, chunk_idx, text, page_num, heading_path, heading_level,
    chunk_type, sentence_count, list_type, list_length) for every PDF
    matched by `path_glob`."""
    chars = read_pdf_chars(spark, path_glob)
    lines = chars_to_lines(chars)
    clean = filter_noise_lines(lines, page_height)
    ordered = two_column_order(clean, page_width)
    blocks = lines_to_blocks(ordered)
    block_in = blocks.select(
        "doc",
        "page",
        # block_idx restarts per page; the chunker consumes one global
        # per-doc order, so compose (page, block_idx) into a single key
        (F.col("page").cast("long") * 1000000 + F.col("block_idx")).alias("ord"),
        "text",
        "font_size",
        "font_weight",
        "n_lines",
        "symbols",
        "nums",
    )
    base = baseline_font(block_in)
    return chunk_documents(block_in, baselines=base)
