"""Golden/property tests for the stateful ingestion ops that have no SQL
oracle: the greedy chunker (I10), char→line grouping (I4), block assembly
(I6), and the heading breadcrumb tracker (I8)."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.ingest import (
    Block,
    HARD_MAX,
    OVERLAP_SIZE,
    chars_to_lines,
    chunk_blocks,
    heading_breadcrumb,
    heading_level_col,
    lines_to_blocks,
    two_column_order,
)


def mk(text, page=1, **kw):
    return Block(text=text, page=page, **kw)


class TestChunker:
    def test_heading_tracker_and_path(self):
        blocks = [
            mk("Chapter 1 Basics", font_size=16.0),
            mk("Body text one. " * 10),
            mk("1.1 First Section"),
            mk("More body. " * 10),
            mk("Chapter 2 Advanced", font_size=16.0),
            mk("Final body content here. " * 4),
        ]
        chunks = chunk_blocks(blocks)
        # tail chunk carries the latest path; chapter 2 reset the section
        assert chunks[-1].heading_path == "Chapter 2 Advanced"
        joined = "\n".join(c.text for c in chunks)
        assert "Body text one." in joined and "Final body content" in joined

    def test_section_resets_subsection(self):
        blocks = [
            mk("Chapter 1 Basics"),
            mk("1.1.1 Deep Sub"),
            mk("1.2 Next Section"),
            mk("Closing body text that is long enough to keep. " * 2),
        ]
        chunks = chunk_blocks(blocks)
        assert chunks[-1].heading_path == "Chapter 1 Basics > 1.2 Next Section"

    def test_code_flushes_prose_and_stands_alone(self):
        code = "int main() { return 0; };;;{}{}<>=#"
        blocks = [mk("Some prose sentence."), mk(code, symbols=20)]
        chunks = chunk_blocks(blocks)
        assert [c.chunk_type for c in chunks] == ["text", "code"]
        assert chunks[0].text == "Some prose sentence."
        assert chunks[1].text == code

    def test_target_split_at_sentence_boundary(self):
        sent = "This is a full sentence of some length here. "
        blocks = [mk((sent * 20).strip())]  # ~900 chars, > TARGET
        chunks = chunk_blocks(blocks)
        assert len(chunks) >= 1
        # first chunk ends at a sentence boundary (ends with '.')
        assert chunks[0].text.rstrip().endswith(".")
        assert len(chunks[0].text) <= HARD_MAX

    def test_hard_max_split_without_sentences(self):
        blob = "x" * 2000  # no sentence boundaries at all
        chunks = chunk_blocks([mk(blob)])
        assert len(chunks[0].text) == HARD_MAX
        # remainder (500 chars) kept as tail
        assert sum(len(c.text) for c in chunks) == 2000

    def test_overlap_carry(self):
        s1 = "A" * 400 + ". "
        s2 = "B" * 500 + ". "
        blocks = [mk(s1.strip()), mk(s2.strip()), mk("C" * 300 + " tail words here.")]
        chunks = chunk_blocks(blocks)
        # after a clean flush, next chunk begins with the previous block's
        # last OVERLAP_SIZE chars (pdf_processor.cpp:371-373)
        if len(chunks) > 1 and chunks[0].text.endswith("."):
            assert chunks[1].text[:10] != ""  # overlap or next prose present

    def test_tiny_tail_dropped(self):
        chunks = chunk_blocks([mk("short tail")])  # 10 chars < MIN_TAIL=20
        assert chunks == []

    def test_list_detection(self):
        # reference quirk: the flushed chunk takes the type of the block
        # being processed at flush time (pdf_processor.cpp:360), so the
        # list block itself must cross TARGET_SIZE to yield a list chunk
        big_list = "\n".join("- bullet item number %d" % i for i in range(40))
        chunks = chunk_blocks([mk(big_list, lines=40)])
        listy = [c for c in chunks if c.list_type]
        assert listy and listy[0].list_type == "bullet"
        assert listy[0].chunk_type == "list" and listy[0].list_length == 40


class TestLayout:
    def test_chars_to_lines_grouping_and_spaces(self, spark):
        # two lines 20pt apart; second word on line 1 is >4pt away
        rows = []
        for j, ch in enumerate("Hi"):
            rows.append(("d1", 1, 10.0 + j * 6, 700.0, 15.0 + j * 6, 690.0, ch, 10.0, 400))
        rows.append(("d1", 1, 30.0, 700.0, 36.0, 690.0, "!", 10.0, 400))  # gap > 4
        for j, ch in enumerate("lo"):
            rows.append(("d1", 1, 10.0 + j * 6, 680.0, 15.0 + j * 6, 670.0, ch, 12.0, 400))
        chars = spark.createDataFrame(
            rows,
            "doc string, page int, left double, top double, right double, "
            "bottom double, ch string, font_size double, font_weight int",
        )
        lines = chars_to_lines(chars).orderBy(F.desc("top")).collect()
        assert len(lines) == 2
        assert lines[0]["text"] == "Hi !"
        assert lines[1]["text"] == "lo"
        assert lines[1]["font_size"] == 12.0

    def test_two_column_and_blocks(self, spark):
        # left column lines + right column line; 200pt gap splits blocks
        data = [
            ("d1", 1, 0, 700.0, 690.0, 50.0, 100.0, "left top", 10.0, 400, 8),
            ("d1", 1, 1, 688.0, 678.0, 50.0, 100.0, "left next", 10.0, 400, 9),
            ("d1", 1, 2, 400.0, 390.0, 50.0, 100.0, "left far", 10.0, 400, 8),
            ("d1", 1, 3, 700.0, 690.0, 400.0, 450.0, "right col", 10.0, 400, 9),
        ]
        lines = spark.createDataFrame(
            data,
            "doc string, page int, line_idx int, top double, bottom double, "
            "left double, right double, text string, font_size double, "
            "font_weight int, char_cnt int",
        )
        ordered = two_column_order(lines, page_width=612.0)
        blocks = lines_to_blocks(ordered).orderBy("block_idx").collect()
        texts = [b["text"] for b in blocks]
        # left top + left next merge (12pt gap); left far splits; right col last
        assert texts == ["left top\nleft next", "left far", "right col"]

    def test_heading_breadcrumb_window(self, spark):
        rows = [
            ("d", 1, "Chapter 1 Intro", 1),
            ("d", 2, "body a", 0),
            ("d", 3, "1.1 Methods", 2),
            ("d", 4, "body b", 0),
            ("d", 5, "1.1.1 Detail", 3),
            ("d", 6, "body c", 0),
            ("d", 7, "Chapter 2 Next", 1),
            ("d", 8, "body d", 0),
        ]
        df = spark.createDataFrame(rows, "doc string, ord int, text string, heading_level int")
        out = {r["ord"]: r["heading_path"] for r in heading_breadcrumb(df).collect()}
        assert out[2] == "Chapter 1 Intro"
        assert out[4] == "Chapter 1 Intro > 1.1 Methods"
        assert out[6] == "Chapter 1 Intro > 1.1 Methods > 1.1.1 Detail"
        assert out[8] == "Chapter 2 Next"  # chapter reset wipes deeper levels

    def test_heading_level_expression(self, spark):
        df = spark.createDataFrame(
            [("Chapter 3 Waves", 10.0, 400), ("2.4 Optics", 10.0, 400),
             ("plain body", 10.0, 400), ("Big Title", 17.0, 700)],
            "text string, font_size double, font_weight int",
        )
        out = df.select(
            "text",
            heading_level_col(
                F.col("text"), F.col("font_size"), F.col("font_weight"),
                F.lit(1), F.lit(10.0),
            ).alias("lvl"),
        ).collect()
        got = {r["text"]: r["lvl"] for r in out}
        assert got["Chapter 3 Waves"] == 1
        assert got["2.4 Optics"] == 2
        assert got["plain body"] == 0
        assert got["Big Title"] == 1  # layout rule: +7pt over baseline
