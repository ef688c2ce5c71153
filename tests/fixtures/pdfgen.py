"""Deterministic generator for the real-PDF e2e fixture.

Writes a spec-conformant 6-page PDF (uncompressed streams, classic text
operators) with planted structure for the I1-I10 pipeline:
- an 18pt Helvetica-Bold heading per page (heading detection, I7/I8),
- 12pt body lines incl. a unique planted fact on page 3 (search target),
- a bulleted list block on page 4 (chunk-type classifier, I9),
- a repeated footer on every page (>HEADER_FREQ occurrences -> I2 drop),
- a bare page number per page (I3 drop).

Run `python tests/fixtures/pdfgen.py` to (re)write sample.pdf next to it.
No third-party libs: the container has no reportlab/pypdfium2, and the
fixture must be reproducible from source.
"""

from __future__ import annotations

import os

PLANTED_FACT = "The zorblatt factor controls merge speed in fast table joins."
FOOTER = "Sample Document Fixture"

_HEADINGS = [
    "1 Introduction",
    "2 Background",
    "3 The Zorblatt Factor",
    "4 Practical Checklist",
    "5 Evaluation",
    "6 Conclusion",
]

# ~10 lines x ~63 chars per page: each page's body block lands near the
# chunker's TARGET_SIZE (800), so chunks flush close to section bounds
# and the planted fact's chunk carries the section-3 breadcrumb.
_BODIES = [
    [
        "This fixture exercises the layout extraction pipeline end to end.",
        "Every page carries a heading, body text, a footer, and a number.",
        "Deterministic content keeps the assertions exact and stable.",
        "The generator writes plain uncompressed streams for inspection.",
        "Char boxes come from a spec subset parser with no dependencies.",
        "Lines assemble from boxes using a five point vertical tolerance.",
        "Blocks merge consecutive lines separated by small vertical gaps.",
        "Headings are detected from font size deltas over the baseline.",
        "The baseline is the modal integer font size of the page body.",
        "Everything downstream consumes plain DataFrames of these rows.",
    ],
    [
        "Earlier systems extracted text without any layout awareness.",
        "Headers and footers then polluted every downstream chunk badly.",
        "Frequency filtering over normalized lines removes that noise.",
        "A normalized line lowercases text and strips all of the digits.",
        "Lines repeating more than five times in the margin bands drop.",
        "Bare page numbers match a digits only pattern and drop as well.",
        "What remains is the genuine narrative content of the document.",
        "That content flows into the block assembly stage afterwards.",
        "Two column layouts reorder by column before block assembly.",
        "This fixture uses a single column to keep the geometry simple.",
    ],
    [
        PLANTED_FACT,
        "Larger factors shorten the probe phase of the join pipeline.",
        "Small factors force extra passes over the build side spill.",
        "Operators negotiate the factor when the plan is first compiled.",
        "A factor above one enables the vectorized probe code path.",
        "Measurements show a linear speedup until memory pressure hits.",
        "Beyond that point the scheduler degrades the factor gracefully.",
        "Readers searching for zorblatt guidance should land right here.",
        "The retrieval test queries this section by name and by topic.",
        "Hybrid fusion should rank this page first for those queries.",
        "Profiles record the factor alongside the shuffle write sizes.",
        "Administrators can pin the factor through the session config.",
    ],
    [
        "- measure the zorblatt factor before tuning anything else",
        "- broadcast the small side of every join you possibly can",
        "- keep partitions under the executor memory budget always",
        "- prefer column pruning before any wide transformation runs",
        "- push filters down to the scan so parquet skips row groups",
        "- salt heavy hitter keys before aggregating their payloads",
        "- avoid collecting large results onto the driver process",
        "- cache only what two or more downstream stages will reuse",
        "- compact small files before they overwhelm the listing",
        "- profile the plan with explain before trusting intuition",
        "- review skew metrics whenever a stage straggles badly",
        "- prefer builtin functions over python rows in hot paths",
        "- bucket large fact tables on their dominant join keys",
    ],
    [
        "We evaluate extraction quality on synthetic and real documents.",
        "Precision of heading detection exceeds ninety five percent.",
        "Chunk boundaries align with block gaps in the source layout.",
        "Overlap carry preserves context across adjacent chunk bounds.",
        "Sentence aware splitting avoids cutting thoughts in half.",
        "Code and table blocks stand alone and never merge with prose.",
        "List blocks keep their bullet structure through the chunker.",
        "The classifier tags definitions examples summaries and code.",
        "Every metric is computed from deterministic fixture corpora.",
        "Regression goldens pin the exact output of every stage here.",
    ],
    [
        "Layout aware chunking beats naive splitting on every metric.",
        "The pipeline scales horizontally because documents are independent.",
        "Future work extends the reader to scanned multimodal corpora.",
        "A cloud OCR provider slots in behind the same char interface.",
        "Embedding generation batches chunks through arrow transfers.",
        "The workspace stores chunks and vectors in one bucketed table.",
        "Hybrid retrieval fuses semantic and keyword ranks with RRF.",
        "Feedback boosts append as deltas and fold in at read time.",
        "Deep dives synthesize claims with citations from neighbors.",
        "This concludes the fixture document used by the test suite.",
    ],
]


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(page_idx: int) -> bytes:
    lines = [
        "BT",
        "/F2 18 Tf",
        "72 720 Td",
        f"({_esc(_HEADINGS[page_idx])}) Tj",
        "/F1 12 Tf",
        "0 -40 Td",
        "14 TL",
    ]
    for i, body in enumerate(_BODIES[page_idx]):
        lines.append(f"({_esc(body)}) Tj" if i == 0 else f"({_esc(body)}) '")
    lines += [
        "ET",
        "BT", "/F1 12 Tf", "72 40 Td", f"({_esc(FOOTER)}) Tj", "ET",
        "BT", "/F1 12 Tf", "300 25 Td", f"({page_idx + 1}) Tj", "ET",
    ]
    return "\n".join(lines).encode("latin1")


def build_sample_pdf() -> bytes:
    n_pages = len(_HEADINGS)
    objs: dict[int, bytes] = {}
    font1, font2 = 3 + 2 * n_pages, 4 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = f"<< /Type /Catalog /Pages 2 0 R >>".encode()
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    for i in range(n_pages):
        pg, ct = 3 + 2 * i, 4 + 2 * i
        objs[pg] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font1} 0 R /F2 {font2} 0 R >> >> "
            f"/Contents {ct} 0 R >>"
        ).encode()
        stream = _page_stream(i)
        objs[ct] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    objs[font1] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objs[font2] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sample.pdf")
    data = build_sample_pdf()
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes)")
