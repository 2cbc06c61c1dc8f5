#!/usr/bin/env python
"""Fail if any doc's embedded bench table drifted from its source JSON.

Each doc names its own source in the marker (``<!-- BENCH:START
src=BENCH_rNN.json -->``), so a newer round's JSON appearing later does not
flag the docs retroactively — drift means the TABLE no longer matches the
JSON it claims to reflect.  Run by ``make test``.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_docs import (
    DOCS,
    ROOT,
    _AUX_MARKER_RE,
    _MARKER_RE,
    load_metrics,
    render_aux_table,
    render_table,
)


def main():
    bad = []
    for doc in DOCS:
        full = os.path.join(ROOT, doc)
        with open(full) as f:
            text = f.read()
        m = _MARKER_RE.search(text)
        if not m:
            bad.append(f"{doc}: missing BENCH markers")
            continue
        src = m.group(1)
        src_path = os.path.join(ROOT, src)
        if not os.path.exists(src_path):
            bad.append(f"{doc}: src {src} does not exist")
            continue
        expected = render_table(src, load_metrics(src_path))
        if text[m.start():m.end()] != expected:
            bad.append(f"{doc}: bench table drifted from {src} — run "
                       "python scripts/gen_docs.py " + src)
        for am in _AUX_MARKER_RE.finditer(text):
            asrc = am.group(1)
            if not os.path.exists(os.path.join(ROOT, asrc)):
                bad.append(f"{doc}: aux src {asrc} does not exist")
                continue
            if text[am.start():am.end()] != render_aux_table(asrc):
                bad.append(f"{doc}: aux table drifted from {asrc} — run "
                           "python scripts/gen_docs.py")
    if bad:
        print("\n".join(bad), file=sys.stderr)
        return 1
    print(f"docs in sync: {', '.join(DOCS)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
