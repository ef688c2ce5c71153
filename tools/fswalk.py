"""Filesystem snapshot helpers shared by the DML tests and the DML
stress harness (single source of truth for byte-accounting)."""

from __future__ import annotations

import os


def snapshot(table_dir: str) -> dict[str, tuple[int, int]]:
    """relative file path -> (size, mtime_ns) for every file under the
    table directory."""
    out = {}
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, table_dir)] = (st.st_size, st.st_mtime_ns)
    return out


def rewritten_bytes(before: dict, after: dict) -> int:
    """Bytes of files present after that are new or changed."""
    return sum(sz for p, (sz, mt) in after.items() if before.get(p) != (sz, mt))
