"""Blockset alignment (BSA) — global order of blocks along genomes.

Equivalent of the reference's BSA family (``FindBSA`` / ``ChrBSA`` /
``PrintBSA`` / ``ExactStemBSA`` ⚠[B], SURVEY.md §2.3): align the *order* of
blocks along chromosomes across genomes, exposing the global structure and
rearrangements. Implemented here in the ExactStemBSA flavor: rows are
sequences, the column scaffold is the block order of the first sequence,
built over blocks with exactly one fragment in every genome (stem blocks);
blocks absent from the scaffold (rearranged relative to row 1) are appended
as extra columns. Entries are signed block names (minus = inverse
orientation relative to the fragment's sequence).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from npge_tpu.model.blocks import BlockSet
from npge_tpu.model.naming import block_type


@dataclass
class BSA:
    seq_names: list[str]
    columns: list[str]               # block names, scaffold order
    table: list[list[str]]           # [seq][column] signed block name or "."

    def tsv(self) -> str:
        out = ["sequence\t" + "\t".join(self.columns)]
        for name, row in zip(self.seq_names, self.table):
            out.append(name + "\t" + "\t".join(row))
        return "\n".join(out) + "\n"


def stem_order(bs: BlockSet) -> dict[int, list[tuple[str, int, int]]]:
    """Per-sequence ordered [(block_name, ori, start)] over stem blocks."""
    genome_of_seq = bs.arena.genome_id_of_seq()
    n_genomes = len(bs.arena.genomes())
    per_seq: dict[int, list[tuple[int, str, int]]] = {
        i: [] for i in range(bs.arena.n_seqs)
    }
    for b in bs.blocks:
        if block_type(b, genome_of_seq, n_genomes) != "s":
            continue
        for fi in range(b.n_frags):
            s, st, ln, o = b.frags.row(fi)
            per_seq[s].append((st, b.name or "?", o))
    return {
        s: [(name, o, st) for st, name, o in sorted(items)]
        for s, items in per_seq.items()
    }


def exact_stem_bsa(bs: BlockSet) -> BSA:
    orders = stem_order(bs)
    seq_ids = list(range(bs.arena.n_seqs))
    if not seq_ids:
        return BSA([], [], [])
    scaffold = [name for name, _o, _st in orders.get(0, [])]
    scaffold_set = set(scaffold)
    extras: list[str] = []
    for s in seq_ids[1:]:
        for name, _o, _st in orders[s]:
            if name not in scaffold_set and name not in extras:
                extras.append(name)
    columns = scaffold + extras
    col_of = {name: i for i, name in enumerate(columns)}
    table = []
    for s in seq_ids:
        row = ["."] * len(columns)
        for name, o, _st in orders[s]:
            row[col_of[name]] = name if o == 1 else "-" + name
        table.append(row)
    return BSA([bs.arena.names[s] for s in seq_ids], columns, table)
