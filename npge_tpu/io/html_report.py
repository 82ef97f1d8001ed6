"""Self-contained HTML report — textual analog of the qnpge GUI.

The reference ships a Qt GUI (``qnpge``: BlockSetWidget block table +
AlignmentView colored alignment browser, SURVEY.md §2.5 ⚠[B]); per SURVEY
§2.6 the GUI is out of scope for the metric and textual reports come first.
This module renders the same information — summary, sortable block table,
colored per-block alignment views — into one dependency-free HTML file.
"""

from __future__ import annotations

import html

import numpy as np

from npge_tpu.config import Config
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.stats import column_classes, make_stat
from npge_tpu.io.bs import fragment_id
from npge_tpu.util import codes as C

_CSS = """
body { font-family: system-ui, sans-serif; margin: 1.5em; }
table { border-collapse: collapse; margin: 1em 0; }
td, th { border: 1px solid #ccc; padding: 2px 8px; font-size: 13px; }
th { background: #f0f0f0; }
.aln { font-family: ui-monospace, monospace; font-size: 12px;
       white-space: pre; line-height: 1.1; overflow-x: auto;
       border: 1px solid #ddd; padding: 4px; }
.A { background:#c8e6c9 } .C { background:#bbdefb }
.G { background:#fff9c4 } .T { background:#ffcdd2 }
.N { background:#eeeeee } .gap { color:#999 }
.mis { outline: 1px solid #d32f2f; }
h3 { margin-bottom: 0.2em; }
.meta { color: #666; font-size: 13px; }
"""


def _row_html(row: np.ndarray, ident: np.ndarray) -> str:
    chars = C.decode(row)
    parts = []
    for i, ch in enumerate(chars):
        cls = "gap" if ch == "-" else ch if ch in "ACGT" else "N"
        if ch != "-" and not ident[i]:
            cls += " mis"
        parts.append(f'<span class="{cls}">{ch}</span>')
    return "".join(parts)


def _block_view(b: Block, bs: BlockSet, max_cols: int) -> str:
    rows = b.rows(bs.arena)
    truncated = ""
    if rows.shape[1] > max_cols:
        rows = rows[:, :max_cols]
        truncated = f" (first {max_cols} of {b.n_cols} columns)"
    ident, gapless = column_classes(rows)
    good = ident & gapless
    lines = []
    width = max(
        (len(fragment_id(bs.arena, *b.frags.row(i))) for i in range(b.n_frags)),
        default=0,
    )
    for i in range(b.n_frags):
        fid = fragment_id(bs.arena, *b.frags.row(i)).ljust(width)
        lines.append(
            f"{html.escape(fid)}  {_row_html(rows[i], good)}"
        )
    return (
        f'<h3 id="{html.escape(b.name or "")}">{html.escape(b.name or "?")}'
        f'</h3><div class="meta">{b.n_frags} fragments x {b.n_cols} columns'
        f"{truncated}</div><div class='aln'>" + "\n".join(lines) + "</div>"
    )


def write_report(
    bs: BlockSet,
    path: str,
    cfg: Config | None = None,
    max_blocks: int = 50,
    max_cols: int = 2000,
) -> None:
    from npge_tpu.algo.reports import blockset_summary

    s = blockset_summary(bs, cfg)
    parts = [
        "<!doctype html><meta charset='utf-8'><title>npge-tpu report</title>",
        f"<style>{_CSS}</style>",
        "<h1>npge-tpu pangenome report</h1>",
        f"<div class='meta'>genomes: {s['genomes']} | sequences: "
        f"{s['sequences']} | total {s['total_length']} bp | blocks: "
        f"{s['blocks']} | shared: {100 * s['shared_fraction']:.2f}% | "
        f"hash: {s['blockset_hash']}</div>",
        "<h2>Blocks</h2>",
        "<table><tr><th>name</th><th>fragments</th><th>columns</th>"
        "<th>identity</th><th>view</th></tr>",
    ]
    shown = 0
    order = sorted(
        range(len(bs.blocks)),
        key=lambda i: (-bs.blocks[i].n_frags * bs.blocks[i].n_cols, i),
    )
    views = []
    for i in order:
        b = bs.blocks[i]
        st = make_stat(b, bs.arena)
        idn = st.ident_nogap / max(st.total, 1)
        link = ""
        if b.n_frags >= 2 and shown < max_blocks:
            link = f"<a href='#{html.escape(b.name or '')}'>view</a>"
            views.append(_block_view(b, bs, max_cols))
            shown += 1
        parts.append(
            f"<tr><td>{html.escape(b.name or '?')}</td><td>{b.n_frags}</td>"
            f"<td>{b.n_cols}</td><td>{idn:.4f}</td><td>{link}</td></tr>"
        )
    parts.append("</table><h2>Alignments</h2>")
    parts.extend(views)
    with open(path, "w") as fh:
        fh.write("\n".join(parts))
