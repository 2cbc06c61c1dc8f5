#!/usr/bin/env python
"""Regenerate the driver-captured benchmark tables embedded in the docs.

Every round the driver writes ``BENCH_r{N}.json``; the perf tables in
README.md / BASELINE.md / docs/PERF_NOTES.md are GENERATED from that JSON
between ``<!-- BENCH:START src=... -->`` / ``<!-- BENCH:END -->`` markers so
the numbers can never drift from what was actually measured (the round-3
verdict flagged exactly that drift).  ``scripts/check_docs.py`` (run by
``make test``) fails if a doc's table does not match a regeneration from the
src named in its own marker.

Usage:
    python scripts/gen_docs.py [BENCH_rNN.json]   # default: latest in repo
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = ["README.md", "BASELINE.md", "docs/PERF_NOTES.md"]

_LABELS = {
    "encode_512px_ms": "512² encode, single shot (incl. tunnel dispatch floor)",
    "encode_256px_full8_ms": "256² FULL search, 8 isometries (config 1)",
    "encode_1024px_quadtree_ms": "1024² quadtree encode, range 4..16 (config 3)",
    "encode_1024px_quadtree_batch8_ms_per_frame":
        "1024² quadtree, batched ×8 (per frame)",
    "encode_2048px_ms": "2048² encode, full domain pool (config 4 lane)",
    "encode_4096px_ms": "4096² encode (config 5 lane)",
    "decode_512px_ms": "512² decode to fixed point",
    "decode_2048px_ms": "2048² decode to fixed point",
    "decode_throughput_512px_batch16": "512² decode, batched ×16",
    "psnr_512px_q5s7o_db": "512² decode PSNR @ 5-bit s / 7-bit o",
    "bpp_512px_q5s7o": "512² rate @ 5-bit s / 7-bit o",
    "psnr_1024px_quadtree_q5s7o_db": "1024² quadtree PSNR @ 5/7-bit",
    "bpp_1024px_quadtree_q5s7o": "1024² quadtree rate @ 5/7-bit",
    "psnr_1024px_quadtree_hq_db":
        "1024² quadtree PSNR, hq point (6/7-bit, threshold 25)",
    "bpp_1024px_quadtree_hq":
        "1024² quadtree rate, hq point (6/7-bit, threshold 25)",
    "encode_8192px_ms": "8192² encode (single chip)",
    "encode_throughput_512px_lenna_batch64": "512² encode, batched ×64",
    "encode_throughput_512px_lenna_batch16":
        "**HEADLINE**: 512² encode, batched ×16",
}


def load_metrics(path: str) -> list[dict]:
    with open(path) as f:
        data = json.load(f)
    metrics = []
    for line in data.get("tail", "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                m = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in m:
                metrics.append(m)
    return metrics


def render_table(src: str, metrics: list[dict]) -> str:
    lines = [
        f"<!-- BENCH:START src={src} -->",
        f"Driver-captured numbers from `{src}` (regenerate with "
        "`python scripts/gen_docs.py`):",
        "",
        "| Workload | Value | vs C++ baseline |",
        "|---|---|---|",
    ]
    for m in metrics:
        label = _LABELS.get(m["metric"], m["metric"])
        vs = f"**{m['vs_baseline']:g}×**" if m.get("vs_baseline") else "—"
        lines.append(f"| {label} | {m['value']:g} {m['unit']} | {vs} |")
    lines.append("<!-- BENCH:END -->")
    return "\n".join(lines)


_MARKER_RE = re.compile(
    r"<!-- BENCH:START src=(\S+) -->.*?<!-- BENCH:END -->", re.DOTALL
)

# Generic measurement tables (rate-distortion curve, VQ tradeoff, ...):
# a script under scripts/ writes a JSON {"title", "columns", "rows"} into
# docs/, and the table in the doc is generated from it — same no-drift
# contract as the BENCH tables, enforced by scripts/check_docs.py.
_AUX_MARKER_RE = re.compile(
    r"<!-- AUX:START src=(\S+) -->.*?<!-- AUX:END -->", re.DOTALL
)


def render_aux_table(src: str) -> str:
    with open(os.path.join(ROOT, src)) as f:
        data = json.load(f)
    lines = [
        f"<!-- AUX:START src={src} -->",
        f"{data['title']} (generated from `{src}`; regenerate the JSON with "
        f"`python {data['script']}` and the table with "
        "`python scripts/gen_docs.py`):",
        "",
        "| " + " | ".join(data["columns"]) + " |",
        "|" + "---|" * len(data["columns"]),
    ]
    for row in data["rows"]:
        cells = [x if isinstance(x, str) else f"{x:g}" for x in row]
        lines.append("| " + " | ".join(cells) + " |")
    lines.append("<!-- AUX:END -->")
    return "\n".join(lines)


def regen_aux(doc_path: str) -> bool:
    """Rewrite every AUX marker block in the doc from its named JSON."""
    full = os.path.join(ROOT, doc_path)
    with open(full) as f:
        text = f.read()
    changed = False
    out = []
    last = 0
    for m in _AUX_MARKER_RE.finditer(text):
        out.append(text[last:m.start()])
        table = render_aux_table(m.group(1))
        out.append(table)
        changed = changed or table != text[m.start():m.end()]
        last = m.end()
    out.append(text[last:])
    new = "".join(out)
    if changed:
        with open(full, "w") as f:
            f.write(new)
    return changed


def regen_doc(doc_path: str, src: str | None) -> bool:
    """Rewrite the marker block. Returns True if the file changed."""
    full = os.path.join(ROOT, doc_path)
    with open(full) as f:
        text = f.read()
    m = _MARKER_RE.search(text)
    if not m:
        return False
    use_src = src or m.group(1)
    table = render_table(use_src, load_metrics(os.path.join(ROOT, use_src)))
    new = text[: m.start()] + table + text[m.end():]
    if new != text:
        with open(full, "w") as f:
            f.write(new)
        return True
    return False


def main(argv):
    if len(argv) > 1:
        src = argv[1]
    else:
        benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                         key=os.path.getmtime)
        if not benches:
            print("no BENCH_r*.json found", file=sys.stderr)
            return 1
        src = os.path.basename(benches[-1])
    for doc in DOCS:
        changed = regen_doc(doc, src)
        aux_changed = regen_aux(doc)
        state = "updated" if (changed or aux_changed) else "unchanged"
        print(f"{doc}: {state}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
