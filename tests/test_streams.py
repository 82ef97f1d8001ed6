"""Named stream resolution (util/streams; reference name_to_stream [C])."""

import os

from npge_tpu.util.streams import (
    memory_stream,
    name_to_istream,
    name_to_ostream,
    read_text,
    reset_memory_streams,
    write_text,
)


def test_memory_stream_round_trip():
    reset_memory_streams()
    write_text(":buf", "hello ")
    write_text(":buf", "world")
    assert read_text(":buf") == "hello world"
    # distinct names are distinct buffers
    write_text(":other", "x")
    assert read_text(":other") == "x"
    assert read_text(":buf") == "hello world"


def test_file_round_trip(tmp_path):
    p = str(tmp_path / "t.txt")
    write_text(p, "abc")
    assert read_text(p) == "abc"


def test_null_and_process_streams():
    s, close = name_to_ostream(":null")
    s.write("discarded")
    if close:
        s.close()
    assert read_text(":null") == ""
    import sys

    s, close = name_to_ostream(":stdout")
    assert s is sys.stdout and not close
    s, close = name_to_istream(":stdin")
    assert s is sys.stdin and not close


def test_post_processing_target_override(tmp_path):
    """A report processor can write to a named in-memory stream instead of
    a file (the reference's name_to_stream test pattern, SURVEY §2.4)."""
    from npge_tpu.cli import main
    from npge_tpu.io.fasta import write_fasta
    from npge_tpu.util.synthetic import synthetic_arena

    reset_memory_streams()
    arena = synthetic_arena(n_genomes=2, length=3000, seed=4)
    paths = []
    for i in range(2):
        p = tmp_path / f"g{i}.fa"
        with open(p, "w") as fh:
            write_fasta(fh, [(arena.names[i], arena.seq_codes(i))])
        paths.append(str(p))
    w = str(tmp_path / "work")
    opts = ["-o", "ANCHOR_SIZE=17", "-o", "MIN_LENGTH=60", "-o", "MIN_END=3"]
    main(["prepare", "--fasta", *paths, "-w", w])
    main(["make-pangenome", "-w", w, *opts])
    main([
        "post-processing", "-w", w,
        "--target", "info.txt=:infobuf",
        "--target", "blocks.tsv=:blocksbuf",
    ])
    info = memory_stream("infobuf").getvalue()
    blocks = memory_stream("blocksbuf").getvalue()
    assert "blocks" in info and len(blocks.splitlines()) >= 2
    # redirected outputs must NOT be written as files
    assert not os.path.exists(os.path.join(w, "info.txt"))
    assert not os.path.exists(os.path.join(w, "blocks.tsv"))
    # non-redirected outputs still land on disk
    assert os.path.exists(os.path.join(w, "mutations.tsv"))
