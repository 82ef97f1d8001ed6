"""Generate the bundled example dataset (synthetic stand-in for the
reference's examples/Brucella — that data needs network/reference access,
neither of which exists here; SURVEY.md §0).

Writes 5 strain genomes (2 chromosomes each, ~0.3% pairwise divergence,
indels + one inversion) as FASTA plus a genomes.tsv accession table, then
prints the CLI walkthrough.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from npge_tpu.io.fasta import write_fasta
from npge_tpu.util.synthetic import mutate, random_ancestor

OUT = os.path.dirname(os.path.abspath(__file__))
N_STRAINS = 5

rng = np.random.default_rng(2026)
chr1 = random_ancestor(rng, 600_000)
chr2 = random_ancestor(rng, 250_000)

rows = []
for i in range(N_STRAINS):
    acc = f"SYN{i:03d}"
    genome = f"STRAIN{i}"
    seqs = [
        (f"{acc}.1", mutate(rng, chr1, sub_rate=0.0015, indel_rate=0.0001,
                            n_inversions=1 if i == 2 else 0)),
        (f"{acc}.2", mutate(rng, chr2, sub_rate=0.0015, indel_rate=0.0001)),
    ]
    # one FASTA file per accession (one record each), like GetData downloads
    for rec_name, rec in seqs:
        with open(os.path.join(OUT, f"{rec_name}.fa"), "w") as fh:
            write_fasta(fh, [(rec_name, rec)])
    rows.append((f"{acc}.1", f"{genome}&chr1&c"))
    rows.append((f"{acc}.2", f"{genome}&chr2&c"))

with open(os.path.join(OUT, "genomes.tsv"), "w") as fh:
    fh.write("# accession\tGENOME&CHR&circularity\n")
    for acc, name in rows:
        fh.write(f"{acc}\t{name}\n")

print(f"wrote {N_STRAINS} strain FASTAs + genomes.tsv under {OUT}")
print(
    "\nwalkthrough:\n"
    "  python -m npge_tpu.cli prepare --fasta examples/synthetic/SYN*.fa -w work\n"
    "  python -m npge_tpu.cli examine -w work\n"
    "  python -m npge_tpu.cli make-pangenome -w work --timing\n"
    "  python -m npge_tpu.cli check -w work --deep\n"
    "  python -m npge_tpu.cli post-processing -w work\n"
    "  python -m npge_tpu.cli report -w work\n"
)
