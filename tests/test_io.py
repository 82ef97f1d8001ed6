import io

import numpy as np

from npge_tpu.io.bs import read_blockset, write_blockset
from npge_tpu.io.fasta import read_fasta, write_fasta
from npge_tpu.model.arena import GenomeArena
from npge_tpu.model.blocks import Block, BlockSet
from npge_tpu.model.fragments import FragmentTable
from npge_tpu.model.hashing import blockset_hash
from npge_tpu.model.naming import assign_names
from npge_tpu.util import codes as C


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    with open(p, "w") as fh:
        write_fasta(fh, [("s1 desc here", "ACGTACGT"), ("s2", "TTTT")])
    recs = read_fasta(str(p))
    assert recs[0][0] == "s1" and C.decode(recs[0][1]) == "ACGTACGT"
    assert recs[1][0] == "s2" and C.decode(recs[1][1]) == "TTTT"


def test_blockset_roundtrip():
    arena = GenomeArena.from_strings(
        {"G1&c1&l": "ACGTACGTAA", "G2&c1&l": "TTACGTACGT"}
    )
    aln = np.stack([C.encode("ACGTACGT"), C.encode("ACGTACGT")])
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 8, 1), (1, 2, 8, 1)])),
            Block(FragmentTable.from_rows([(0, 8, 2, 1)])),
            Block(FragmentTable.from_rows([(1, 0, 2, -1)])),
        ],
    )
    assign_names(bs)
    buf = io.StringIO()
    write_blockset(buf, bs)
    buf2 = io.BytesIO(buf.getvalue().encode())
    bs2 = read_blockset(buf2)
    assert blockset_hash(bs2) == blockset_hash(bs)
    assert sorted(b.name for b in bs2.blocks) == sorted(b.name for b in bs.blocks)


def test_npz_checkpoint_roundtrip(tmp_path):
    from npge_tpu.io.checkpoint import load_npz, save_npz

    arena = GenomeArena.from_strings(
        {"G1&c1&l": "ACGTACGTAA", "G2&c1&l": "TTACGTACGT"}
    )
    aln = np.stack([C.encode("ACGT-CGT"), C.encode("ACGTACGT")])
    bs = BlockSet(
        arena,
        [
            Block(FragmentTable.from_rows([(0, 0, 7, 1), (1, 2, 8, 1)]), aln),
            Block(FragmentTable.from_rows([(0, 8, 2, -1)]), name="u1x2"),
        ],
    )
    p = tmp_path / "x.npz"
    save_npz(str(p), bs)
    bs2 = load_npz(str(p))
    assert blockset_hash(bs2) == blockset_hash(bs)
    assert bs2.blocks[1].name == "u1x2"


def test_bs_roundtrip_at_scale():
    """Round-trip a realistic multi-thousand-block set through .bs and npz."""
    import io as iomod

    from npge_tpu.algo.pangenome import build_pangenome
    from npge_tpu.config import default_config
    from npge_tpu.io.checkpoint import load_npz, save_npz
    from npge_tpu.util.synthetic import synthetic_arena

    arena = synthetic_arena(
        n_genomes=4, length=30000, seed=202, sub_rate=0.015,
        indel_rate=0.001, n_inversions=3,
    )
    cfg = default_config().replace(
        ANCHOR_SIZE=17, MINIMIZER_WINDOW=8, MIN_LENGTH=60, MIN_END=3,
        MAX_LOOPS=3,
    )
    bs, _ = build_pangenome(arena, cfg)
    assert len(bs.blocks) >= 3
    buf = iomod.StringIO()
    write_blockset(buf, bs)
    bs2 = read_blockset(iomod.BytesIO(buf.getvalue().encode()))
    assert blockset_hash(bs2) == blockset_hash(bs)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.npz")
        save_npz(p, bs)
        bs3 = load_npz(p)
        assert blockset_hash(bs3) == blockset_hash(bs)


def test_read_blockset_handwritten_with_comments():
    """Reader robustness on a file we did not write ourselves: interleaved
    '#' comments, multi-line wrapped sequences, reverse-strand fragment ids,
    and a gapped block."""
    import io as _io

    text = """\
# hand-written blockset
# section: sequences
>gA&chr1&l
ACGTAC
GTACGT
# a comment inside the sequences section
>gB&chr1&l
ACGTACGTACGT

# section: blocks
>gA&chr1&l_0_3 block=b1
ACGT
>gB&chr1&l_3_0 block=b1
ACGT
# gapped block
>gA&chr1&l_4_9 block=b2
ACG-TAC
>gB&chr1&l_4_10 block=b2
ACGGTAC
"""
    bs = read_blockset(_io.StringIO(text))
    assert len(bs.blocks) == 2
    b1 = next(b for b in bs.blocks if b.name == "b1")
    assert b1.alignment is None and b1.n_frags == 2
    # reverse-strand id gB.._3_0 -> start 0, len 4, ori -1
    rows = {tuple(b1.frags.row(i)) for i in range(2)}
    assert (1, 0, 4, -1) in rows
    b2 = next(b for b in bs.blocks if b.name == "b2")
    assert b2.alignment is not None and b2.n_cols == 7


def test_read_blockset_rejects_gapless_length_mismatch():
    import io as _io
    import pytest

    text = """\
>gA&chr1&l
ACGTACGTACGT
>gA&chr1&l_0_3 block=b1
ACGTACGT
"""
    with pytest.raises(ValueError, match="length differs"):
        read_blockset(_io.StringIO(text))


def test_getdata_rejects_path_escape_accessions(tmp_path):
    """Accessions are interpolated into the URL template and the dest
    path; anything outside [A-Za-z0-9._-] (or dot-led) must be rejected
    before any filesystem or network touch (round-4 advisor finding)."""
    import pytest

    from npge_tpu.io.getdata import fetch_accession, fetch_missing

    for bad in ("../../x", "a/b", "..", ".hidden", "x y", "a{b}", ""):
        with pytest.raises(SystemExit, match="invalid accession"):
            fetch_accession(bad, str(tmp_path))
        with pytest.raises(SystemExit, match="invalid accession"):
            fetch_missing([bad], str(tmp_path))
    assert not any(tmp_path.iterdir())  # nothing written


def test_getdata_http_fetch(tmp_path):
    """GetData over HTTP against a LOCAL server (no egress here): prepare
    --genomes --download fetches missing accessions through the
    NPGE_FASTA_URL template and ingests them (SURVEY §2.3 GetData row)."""
    import http.server
    import os
    import subprocess
    import sys
    import threading

    served = tmp_path / "served"
    served.mkdir()
    (served / "ACC1").write_text(">ACC1\nACGTACGTACGTACGTACGT\n")
    (served / "ACC2").write_text(">ACC2\nTTTTACGTACGTACGTAAAA\n")
    handler = http.server.SimpleHTTPRequestHandler
    httpd = http.server.ThreadingHTTPServer(
        ("localhost", 0), lambda *a, **k: handler(*a, directory=str(served), **k)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        gt = tmp_path / "genomes.tsv"
        gt.write_text("ACC1 G1&chr&l\nACC2 G2&chr&l\n")
        wd = tmp_path / "work"
        data = tmp_path / "data"
        env = dict(
            os.environ,
            NPGE_FASTA_URL=f"http://localhost:{port}/{{acc}}",
            JAX_PLATFORMS="cpu",
        )
        r = subprocess.run(
            [sys.executable, "-m", "npge_tpu.cli", "prepare",
             "--genomes", str(gt), "--data-dir", str(data),
             "--download", "-w", str(wd)],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert (data / "ACC1.fa").exists() and (data / "ACC2.fa").exists()
        assert "prepared 2 sequences, 40 bp" in r.stdout
        # second prepare skips the fetch (files present) and still works
        r2 = subprocess.run(
            [sys.executable, "-m", "npge_tpu.cli", "prepare",
             "--genomes", str(gt), "--data-dir", str(data),
             "-w", str(wd)],
            capture_output=True, text=True, env=env,
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
    finally:
        httpd.shutdown()
