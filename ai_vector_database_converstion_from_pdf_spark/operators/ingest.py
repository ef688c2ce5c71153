"""Ingestion ETL — the PDF-layout pipeline (SURVEY §2.1, I1-I15).

Reference pipeline (`pdf_processor.cpp:23-406`): char boxes → lines →
two-column reorder → header/footer + page-number noise filters → blocks →
baseline font → heading tracker → chunk-type classifier → greedy chunker.

Spark decomposition (per-doc/per-page parallelism — documents are the
unit of scale; a 100 TB corpus is millions of independent docs):

- chars→lines (I4) and lines→blocks (I5/I6): sequential *within a page*
  (tolerance-based grouping with running state), so they run as
  `applyInPandas` per (doc, page) — pages parallelize across executors.
- header/footer frequency (I2): a corpus-wide groupBy + broadcast-join
  filter — pure DataFrame (the reference makes a whole extra pass over
  the PDF for this; Spark gets it as one shuffle).
- heading rules (I8), chunk-type scores (I9): pure expressions; also
  applied inline in the per-doc chunker, which needs them to decide
  flushes (exactly as the reference interleaves them).
- greedy chunker (I10): sequential per *document* (carries heading state
  + overlap across pages) → `applyInPandas` per doc_id. Plain-Python
  core (`chunk_blocks`) so the exact accumulate/split/overlap semantics
  are unit-testable without Spark.

All geometry/threshold constants match the reference (BASELINE.md).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import norm_text

# -- constants (reference: pdf_processor.cpp) --------------------------------
LINE_TOP_TOLERANCE = 5.0     # :109
SPACE_GAP = 4.0              # :136
BLOCK_GAP = 15.0             # :207
BLOCK_GAP_DOWN = 20.0        # :208
HEADER_FREQ = 5              # :46,193
MARGIN_BAND = 0.15           # :45-46,194-196
TARGET_SIZE = 800            # :260
HARD_MAX = 1500              # :261
OVERLAP_SIZE = 160           # :262
MIN_TAIL = 20                # :377
BASELINE_DEFAULT = 10.0      # :243

SENTENCE_SPLIT_RE = r"(?<=[.?!])\s+"                       # :355
CHAPTER_RE = r"(?i)^(Chapter|PART)\s+(\d+)"                # :254
SECTION_RE = r"^(\d+\.\d+)\s+(.*)"                         # :255
SUBSECTION_RE = r"^(\d+\.\d+\.\d+)\s+(.*)"                 # :256
CHUNKTYPE_RE = r"(?i)^(Definition|Example|Theorem|Summary|Exercise|Corollary|Lemma|Proof)[:\s+]"  # :257
CODE_KEYWORD_RE = r"\b(int|class|public|void|return|const|template|static|if|else|for|while)\b"   # :305
DEFINITION_RE = r"(?i)(Definition|Theorem|Lemma|Corollary)[:\s+]"  # :324
SYMBOL_CLASS = r"[{};()#<>:=\-]"                           # :213
LIST_NUM_RE = r"^(\d+|[a-zA-Z])\)"                         # :318


# ---------------------------------------------------------------------------
# I2/I3 — noise filters (DataFrame ops)
# ---------------------------------------------------------------------------

def norm_line(col: Column) -> Column:
    """lowercase, digits stripped, trimmed (`pdf_processor.cpp:50,190`)."""
    return F.trim(F.regexp_replace(F.lower(col), "[0-9]", ""))


def line_frequencies(lines: DataFrame, doc_col: str = "doc", text_col: str = "text") -> DataFrame:
    """I2 pass 1: occurrence count per normalized line per doc (norm len>3)."""
    return (
        lines.select(F.col(doc_col).alias("doc"), norm_line(F.col(text_col)).alias("norm"))
        .filter(F.length("norm") > 3)
        .groupBy("doc", "norm")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def filter_noise_lines(
    lines: DataFrame,
    page_height: float,
    doc_col: str = "doc",
    text_col: str = "text",
    top_col: str = "top",
    freqs: DataFrame | None = None,
) -> DataFrame:
    """I2 pass 2 + I3: drop headers/footers (freq>5 ∧ margin band) and bare
    page numbers (`pdf_processor.cpp:189-201`). freqs joins broadcast —
    it is tiny relative to the line table (distinct headers only)."""
    if freqs is None:
        freqs = line_frequencies(lines, doc_col, text_col)
    withf = lines.withColumn("_norm", norm_line(F.col(text_col))).join(
        F.broadcast(
            freqs.select(
                F.col("doc").alias(doc_col), F.col("norm").alias("_norm"), "freq"
            )
        ),
        [doc_col, "_norm"],
        "left",
    )
    in_band = (F.col(top_col) > page_height * (1 - MARGIN_BAND)) | (
        F.col(top_col) < page_height * MARGIN_BAND
    )
    is_header = (F.length("_norm") > 3) & (F.coalesce(F.col("freq"), F.lit(0)) > HEADER_FREQ) & in_band
    is_pageno = (F.length(F.col(text_col)) < 5) & F.col(text_col).rlike(r"^\s*\d+\s*$")
    return withf.filter(~is_header & ~is_pageno).drop("_norm", "freq")


# ---------------------------------------------------------------------------
# I7 — baseline font (mode of int(font) per page, default 10.0)
# ---------------------------------------------------------------------------

def baseline_font(blocks: DataFrame, doc_col: str = "doc", page_col: str = "page") -> DataFrame:
    """(doc, page, baseline): most frequent int(font_size); ties → the
    *smallest* size (reference iterates a QMap in key order and takes the
    first strict max, `pdf_processor.cpp:242-251`)."""
    counts = (
        blocks.groupBy(doc_col, page_col, F.col("font_size").cast("int").alias("fsz"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(doc_col, page_col).orderBy(F.col("cnt").desc(), F.col("fsz").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(doc_col, page_col, F.col("fsz").cast("double").alias("baseline"))
    )


# ---------------------------------------------------------------------------
# I8 — heading level expression (per block, given baseline)
# ---------------------------------------------------------------------------

def heading_level_col(
    text: Column, font_size: Column, font_weight: Column, n_lines: Column, baseline: Column
) -> Column:
    """0 body / 1 chapter / 2 section / 3 subsection
    (`pdf_processor.cpp:269-289`)."""
    p = F.trim(text)
    layout = (font_size >= baseline + 2.0) & (n_lines <= 3) & (F.length(text) < 120)
    lvl1 = (p.rlike(CHAPTER_RE) | (layout & (font_size >= baseline + 6.0))) & (
        F.length(p) < 100
    )
    lvl2 = (p.rlike(SECTION_RE) | (layout & (font_size >= baseline + 3.0))) & (
        F.length(p) < 120
    )
    lvl3 = (p.rlike(SUBSECTION_RE) | (layout & (font_weight > 600))) & (
        F.length(p) < 150
    )
    return (
        F.when(lvl1, 1).when(lvl2, 2).when(lvl3, 3).otherwise(0).cast("int")
    )


def heading_breadcrumb(
    blocks: DataFrame,
    doc_col: str = "doc",
    ord_col: str = "ord",
    text_col: str = "text",
    level_col: str = "heading_level",
) -> DataFrame:
    """Stateful chapter/section/subsection tracker → `heading_path`
    breadcrumb (`pdf_processor.cpp:269-296`): level-k heading resets all
    deeper levels. Windowed form: carry the last heading of each level
    and keep it only if it appeared after every shallower heading."""
    w = (
        Window.partitionBy(doc_col)
        .orderBy(F.col(ord_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = F.regexp_replace(F.trim(F.col(text_col)), "\n", " ")
    lvl = F.col(level_col)
    out = blocks
    for k in (1, 2, 3):
        out = out.withColumn(
            f"_h{k}", F.last(F.when(lvl == k, p), ignorenulls=True).over(w)
        ).withColumn(
            f"_o{k}", F.last(F.when(lvl == k, F.col(ord_col)), ignorenulls=True).over(w)
        )
    o1, o2, o3 = F.col("_o1"), F.col("_o2"), F.col("_o3")
    sec_ok = F.col("_h2").isNotNull() & (o1.isNull() | (o2 > o1))
    sub_ok = (
        F.col("_h3").isNotNull()
        & (o1.isNull() | (o3 > o1))
        & (F.col("_h2").isNull() | ~sec_ok | (o3 > o2))
    )
    path = F.concat_ws(
        " > ",
        F.col("_h1"),
        F.when(sec_ok, F.col("_h2")),
        F.when(sub_ok, F.col("_h3")),
    )
    return out.withColumn("heading_path", path).drop(
        "_h1", "_h2", "_h3", "_o1", "_o2", "_o3"
    )


# ---------------------------------------------------------------------------
# I9 — chunk-type classifier expression
# ---------------------------------------------------------------------------

def chunk_type_col(
    text: Column, n_lines: Column, symbols: Column, nums: Column
) -> Column:
    """code/table/list/definition/<typed>/text (`pdf_processor.cpp:298-333`).
    Code scoring: symbols>2*lines → +4, keyword regex → +3, indent → +3,
    total ≥5 ⇒ code."""
    p = F.trim(text)
    code_score = (
        F.when(symbols > n_lines * 2, 4).otherwise(0)
        + F.when(p.rlike(CODE_KEYWORD_RE), 3).otherwise(0)
        + F.when(text.startswith("    ") | text.startswith("\t"), 3).otherwise(0)
    )
    n_periods = F.length(text) - F.length(F.regexp_replace(text, r"\.", ""))
    is_table = (nums > n_lines * 3) & (n_periods < (n_lines / 2))
    is_bullet = p.startswith("•") | p.startswith("-") | p.startswith("*")
    is_numbered = p.rlike(LIST_NUM_RE)
    # definition: regex match whose captured keyword starts within 5 chars
    defn = F.regexp_extract(p, DEFINITION_RE, 1)
    is_def = (defn != "") & (F.instr(p, defn) <= 5)
    typed = F.lower(F.regexp_extract(p, CHUNKTYPE_RE, 1))
    return (
        F.when(code_score >= 5, "code")
        .when(is_table, "table")
        .when(is_bullet | is_numbered, "list")
        .when(is_def, "definition")
        .when(typed != "", typed)
        .otherwise("text")
    )


def list_type_col(text: Column) -> Column:
    p = F.trim(text)
    return (
        F.when(p.startswith("•") | p.startswith("-") | p.startswith("*"), "bullet")
        .when(p.rlike(LIST_NUM_RE), "numbered")
        .otherwise("")
    )


# ---------------------------------------------------------------------------
# I10 — greedy chunker (plain-Python core; applyInPandas per doc)
# ---------------------------------------------------------------------------

@dataclass
class Block:
    text: str
    page: int
    font_size: float = 10.0
    font_weight: int = 400
    lines: int = 1
    symbols: int = 0
    nums: int = 0


@dataclass
class Chunk:
    text: str
    page: int
    heading_path: str
    heading_level: int
    chunk_type: str
    sentence_count: int
    list_type: str
    list_length: int


def _sentence_count(s: str) -> int:
    return len(re.split(SENTENCE_SPLIT_RE, s))


def _classify(p: str, blk: Block) -> tuple[str, str, int]:
    code_score = 0
    if blk.symbols > blk.lines * 2:
        code_score += 4
    if re.search(CODE_KEYWORD_RE, p):
        code_score += 3
    if blk.text.startswith("    ") or blk.text.startswith("\t"):
        code_score += 3
    is_table = (blk.nums > blk.lines * 3) and (blk.text.count(".") < blk.lines / 2)
    if code_score >= 5:
        return "code", "", 0
    if is_table:
        return "table", "", 0
    if p.startswith(("•", "-", "*")):
        return "list", "bullet", blk.lines
    if re.search(LIST_NUM_RE, p):
        return "list", "numbered", blk.lines
    m = re.search(DEFINITION_RE, p)
    if m and p.index(m.group(1)) < 5:
        return "definition", "", 0
    m = re.match(CHUNKTYPE_RE, p)
    if m:
        return m.group(1).lower(), "", 0
    return "text", "", 0


def chunk_blocks(
    blocks: list[Block],
    baselines: dict[int, float] | None = None,
) -> list[Chunk]:
    """Faithful re-expression of the reference's per-doc block loop
    (`pdf_processor.cpp:254-389`): heading tracker + classifier + greedy
    accumulate to TARGET_SIZE/HARD_MAX with sentence-boundary split and
    OVERLAP_SIZE carry; code/table blocks flush prose and stand alone;
    trailing chunk kept if > MIN_TAIL chars."""
    baselines = baselines or {}
    chapter = section = subsection = ""
    cur = ""
    out: list[Chunk] = []

    def path() -> str:
        parts = [x for x in (chapter, section, subsection) if x]
        return " > ".join(parts)

    level = 0
    for b, blk in enumerate(blocks):
        p = blk.text.strip()
        if not p:
            continue
        baseline = baselines.get(blk.page, BASELINE_DEFAULT)
        level = 0
        layout = (
            blk.font_size >= baseline + 2.0
            and blk.lines <= 3
            and len(blk.text) < 120
        )
        if (re.search(CHAPTER_RE, p) or (layout and blk.font_size >= baseline + 6.0)) and len(p) < 100:
            chapter, section, subsection, level = p.replace("\n", " "), "", "", 1
        elif (re.search(SECTION_RE, p) or (layout and blk.font_size >= baseline + 3.0)) and len(p) < 120:
            section, subsection, level = p.replace("\n", " "), "", 2
        elif (re.search(SUBSECTION_RE, p) or (layout and blk.font_weight > 600)) and len(p) < 150:
            subsection, level = p.replace("\n", " "), 3

        ctype, ltype, llen = _classify(p, blk)

        if ctype in ("code", "table"):
            if cur:
                out.append(
                    Chunk(cur, blk.page, path(), level, "text", _sentence_count(cur), "", 0)
                )
                cur = ""
            out.append(Chunk(p, blk.page, path(), level, ctype, 0, "", 0))
            continue

        cur = p if not cur else cur + "\n" + p

        if len(cur) >= TARGET_SIZE or len(cur) >= HARD_MAX:
            s_count = _sentence_count(cur)
            last_split = -1
            for m in re.finditer(SENTENCE_SPLIT_RE, cur):
                last_split = m.start()
            if last_split > TARGET_SIZE / 2 and len(cur) < HARD_MAX:
                save, cur = cur[:last_split], cur[last_split:].strip()
            elif len(cur) >= HARD_MAX:
                save, cur = cur[:HARD_MAX], cur[HARD_MAX:].strip()
            else:
                save, cur = cur, ""
            out.append(Chunk(save, blk.page, path(), level, ctype, s_count, ltype, llen))
            if not cur and b > 0:
                cur = blocks[b - 1].text[-OVERLAP_SIZE:]

    if len(cur) > MIN_TAIL:
        last_page = blocks[-1].page if blocks else 1
        out.append(
            Chunk(cur, last_page, path(), 0, "text", _sentence_count(cur), "", 0)
        )
    return out


CHUNK_SCHEMA = (
    "doc string, chunk_idx long, text string, page_num int, heading_path string, "
    "heading_level int, chunk_type string, sentence_count int, "
    "list_type string, list_length int"
)


def chunk_documents(
    blocks: DataFrame,
    doc_col: str = "doc",
    page_col: str = "page",
    ord_col: str = "ord",
    text_col: str = "text",
    baselines: DataFrame | None = None,
) -> DataFrame:
    """I10 over a corpus: per-doc sequential chunking, docs in parallel.
    Expects block columns: text, page, ord, font_size, font_weight,
    n_lines, symbols, nums."""
    base = blocks
    if baselines is not None:
        base = blocks.join(baselines, [doc_col, page_col], "left")
    else:
        base = blocks.withColumn("baseline", F.lit(None).cast("double"))

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col)
        doc = pdf[doc_col].iloc[0]
        blks = [
            Block(
                text=r[text_col],
                page=int(r[page_col]),
                font_size=float(r["font_size"]),
                font_weight=int(r["font_weight"]),
                lines=int(r["n_lines"]),
                symbols=int(r["symbols"]),
                nums=int(r["nums"]),
            )
            for r in pdf.to_dict("records")
        ]
        bl = {
            int(r[page_col]): float(r["baseline"])
            for r in pdf.to_dict("records")
            if r.get("baseline") is not None and not pd.isna(r.get("baseline"))
        }
        chunks = chunk_blocks(blks, bl)
        return pd.DataFrame(
            {
                "doc": [str(doc)] * len(chunks),
                "chunk_idx": range(len(chunks)),
                "text": [c.text for c in chunks],
                "page_num": [c.page for c in chunks],
                "heading_path": [c.heading_path for c in chunks],
                "heading_level": [c.heading_level for c in chunks],
                "chunk_type": [c.chunk_type for c in chunks],
                "sentence_count": [c.sentence_count for c in chunks],
                "list_type": [c.list_type for c in chunks],
                "list_length": [c.list_length for c in chunks],
            }
        )

    return base.groupBy(doc_col).applyInPandas(per_doc, CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# I4/I5/I6 — char→line grouping, two-column reorder, line→block assembly
# (tolerance-based running state → sequential per page; pages parallelize)
# ---------------------------------------------------------------------------

LINE_SCHEMA = (
    "doc string, page int, line_idx int, top double, bottom double, "
    "left double, right double, text string, font_size double, "
    "font_weight int, char_cnt int"
)


def chars_to_lines(chars: DataFrame) -> DataFrame:
    """I4: per (doc,page) sort chars by (top desc w/ 5pt tolerance, left
    asc); break lines on >5pt top jumps; insert spaces on >4pt horizontal
    gaps; average font size/weight per line (`pdf_processor.cpp:96-151`).
    Expects columns: doc, page, left, top, right, bottom, ch, font_size,
    font_weight."""

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        doc, page = str(pdf["doc"].iloc[0]), int(pdf["page"].iloc[0])
        recs = pdf.to_dict("records")
        # reference sort: top desc unless within 5pt, then left asc.
        # Bucket tops to 5pt bands for a stable total order with the
        # same reading-order effect, then exact running-state grouping.
        import functools

        def cmp(a, b):
            if abs(a["top"] - b["top"]) > LINE_TOP_TOLERANCE:
                return -1 if a["top"] > b["top"] else 1
            return -1 if a["left"] < b["left"] else (1 if a["left"] > b["left"] else 0)

        recs.sort(key=functools.cmp_to_key(cmp))
        lines = []
        cur = None
        for c in recs:
            if cur is None:
                cur = {
                    "top": c["top"], "bottom": c["bottom"], "left": c["left"],
                    "right": c["right"], "text": str(c["ch"]),
                    "fs": float(c["font_size"]), "fw": int(c["font_weight"]), "n": 1,
                }
                continue
            if abs(c["top"] - cur["top"]) > LINE_TOP_TOLERANCE:
                lines.append(cur)
                cur = {
                    "top": c["top"], "bottom": c["bottom"], "left": c["left"],
                    "right": c["right"], "text": str(c["ch"]),
                    "fs": float(c["font_size"]), "fw": int(c["font_weight"]), "n": 1,
                }
            else:
                if c["left"] - cur["right"] > SPACE_GAP:
                    cur["text"] += " "
                cur["text"] += str(c["ch"])
                cur["right"] = max(cur["right"], c["right"])
                cur["top"] = max(cur["top"], c["top"])
                cur["bottom"] = min(cur["bottom"], c["bottom"])
                cur["fs"] += float(c["font_size"])
                cur["fw"] += int(c["font_weight"])
                cur["n"] += 1
        if cur is not None and cur["text"]:
            lines.append(cur)
        return pd.DataFrame(
            {
                "doc": doc, "page": page, "line_idx": range(len(lines)),
                "top": [l["top"] for l in lines],
                "bottom": [l["bottom"] for l in lines],
                "left": [l["left"] for l in lines],
                "right": [l["right"] for l in lines],
                "text": [l["text"] for l in lines],
                "font_size": [l["fs"] / l["n"] for l in lines],
                "font_weight": [int(l["fw"] / l["n"]) for l in lines],
                "char_cnt": [l["n"] for l in lines],
            }
        )

    return chars.groupBy("doc", "page").applyInPandas(per_page, LINE_SCHEMA)


def two_column_order(lines: DataFrame, page_width: float) -> DataFrame:
    """I5: left column first, then right, each in original line order
    (`pdf_processor.cpp:168-179`). Adds `ord` — the block-assembly order."""
    col_id = F.when(F.col("left") < page_width / 2.0, 0).otherwise(1)
    w = Window.partitionBy("doc", "page").orderBy(col_id.asc(), F.col("line_idx").asc())
    return lines.withColumn("ord", F.row_number().over(w))


BLOCK_SCHEMA = (
    "doc string, page int, block_idx int, text string, top double, left double, "
    "n_lines int, symbols int, nums int, font_size double, font_weight int"
)


def lines_to_blocks(ordered_lines: DataFrame) -> DataFrame:
    """I6: merge consecutive lines into blocks; new block on vertical gap
    >15pt (either direction) or upward jump >20pt; accumulate symbol/digit
    counts and average fonts (`pdf_processor.cpp:181-240`). Quirk kept:
    the first line of a page's first block is trimmed (set via append
    path), later blocks' first lines are raw."""

    sym_re = re.compile(SYMBOL_CLASS)
    num_re = re.compile(r"\d")

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        doc, page = str(pdf["doc"].iloc[0]), int(pdf["page"].iloc[0])
        recs = pdf.sort_values("ord").to_dict("records")
        blocks = []
        cur = None
        prev = None
        for line in recs:
            force = False
            if prev is not None:
                if abs(prev["top"] - line["top"]) > BLOCK_GAP:
                    force = True
                if line["top"] > prev["top"] + BLOCK_GAP_DOWN:
                    force = True
            if cur is None:
                cur = {
                    "text": line["text"].strip(), "top": line["top"],
                    "left": line["left"], "n": 1,
                    "sym": len(sym_re.findall(line["text"])),
                    "num": len(num_re.findall(line["text"])),
                    "fs": float(line["font_size"]), "fw": int(line["font_weight"]),
                }
            elif force:
                blocks.append(cur)
                cur = {
                    "text": line["text"], "top": line["top"], "left": line["left"],
                    "n": 1,
                    "sym": len(sym_re.findall(line["text"])),
                    "num": len(num_re.findall(line["text"])),
                    "fs": float(line["font_size"]), "fw": int(line["font_weight"]),
                }
            else:
                cur["text"] += ("\n" if cur["text"] else "") + line["text"].strip()
                cur["n"] += 1
                cur["sym"] += len(sym_re.findall(line["text"]))
                cur["num"] += len(num_re.findall(line["text"]))
                cur["fs"] += float(line["font_size"])
                cur["fw"] += int(line["font_weight"])
            prev = line
        if cur is not None and cur["n"] > 0:
            blocks.append(cur)
        return pd.DataFrame(
            {
                "doc": doc, "page": page, "block_idx": range(len(blocks)),
                "text": [b["text"] for b in blocks],
                "top": [b["top"] for b in blocks],
                "left": [b["left"] for b in blocks],
                "n_lines": [b["n"] for b in blocks],
                "symbols": [b["sym"] for b in blocks],
                "nums": [b["num"] for b in blocks],
                "font_size": [b["fs"] / b["n"] for b in blocks],
                "font_weight": [int(b["fw"] / b["n"]) for b in blocks],
            }
        )

    return ordered_lines.groupBy("doc", "page").applyInPandas(per_page, BLOCK_SCHEMA)


# ---------------------------------------------------------------------------
# I12 / I14 — doc identity, tiny-chunk filter (pure expressions)
# ---------------------------------------------------------------------------

def doc_identity(file_name: Column, size: Column) -> Column:
    """docId = MD5(name + "_" + size) (`pdf_processor.cpp:409-416`)."""
    return F.md5(F.concat_ws("_", file_name, size.cast("string")))


def tiny_chunk_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop chunks ≤ 3 trimmed chars (`mainwindow.cpp:741-748`)."""
    return df.filter(F.length(F.trim(F.col(text_col))) > 3)
