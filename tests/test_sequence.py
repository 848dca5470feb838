"""Core sequence-layer tests: tokenizer parity with the reference scalar
algorithm (genomad/sequence.py:170-193), FASTA IO, windows, terminal repeats."""

import numpy as np
import pytest

from genomad_tpu import sequence
from genomad_tpu.sequence import Sequence, read_fasta, seq_windows, tokenize_dna


def reference_tokenize_dna(seq: bytes, word_size: int):
    """Scalar oracle re-deriving the reference numba loop semantics."""
    final_length = len(seq) - word_size + 1
    tokenized = []
    kmer = 0
    countdown = word_size - 1
    mask = (1 << 2 * word_size) - 1
    lut = {65: 0, 67: 1, 71: 2, 84: 3}
    for base in seq:
        if base in lut:
            kmer = ((kmer << 2) | lut[base]) & mask
        else:
            tokenized += [0] * (word_size - countdown)
            countdown = word_size
        if countdown == 0:
            tokenized.append(kmer + 1)
        else:
            countdown -= 1
    return tokenized[:final_length]


@pytest.mark.parametrize(
    "seq",
    [
        b"ACGT",
        b"ACGTN",
        b"NACGT",
        b"ACGTACGTACGT",
        b"NNNN",
        b"ACGNNGTACNGTTTTT",
        b"A",
        b"",
        b"ACG",
    ],
)
def test_tokenize_matches_reference_oracle(seq):
    expected = reference_tokenize_dna(seq, 4)
    got = tokenize_dna(seq, 4)
    assert got.tolist() == expected


def test_tokenize_random_matches_reference_oracle(rng):
    alphabet = np.frombuffer(b"ACGTN", dtype=np.uint8)
    for _ in range(20):
        n = int(rng.integers(0, 300))
        seq = bytes(rng.choice(alphabet, n))
        assert tokenize_dna(seq, 4).tolist() == reference_tokenize_dna(seq, 4)


def test_tokenize_value_range():
    toks = tokenize_dna(b"AAAATTTT", 4)
    assert toks.min() >= 0 and toks.max() <= 256
    assert toks[0] == 1  # AAAA -> 0 + 1
    assert toks[-1] == 256  # TTTT -> 255 + 1


def test_tokenize_windows_pads_with_n():
    out = sequence.tokenize_windows([b"ACGTACGT"], window_length=12)
    assert out.shape == (1, 9)
    # positions beyond the real sequence are N-padded -> token 0
    assert out[0, :5].tolist() == tokenize_dna(b"ACGTACGT", 4).tolist()
    assert (out[0, 5:] == 0).all()


def test_read_fasta_roundtrip(tmp_fasta):
    path = tmp_fasta([("s1 desc here", "ACGTacgt"), ("s2", "NNNACGTNNN")])
    seqs = list(read_fasta(path))
    assert [s.accession for s in seqs] == ["s1", "s2"]
    assert seqs[0].header == "s1 desc here"
    assert seqs[0].seq == "ACGTacgt"
    stripped = list(read_fasta(path, strip_n=True))
    assert stripped[1].seq == "ACGT"


def test_read_fasta_gzip(tmp_path):
    import gzip

    path = tmp_path / "x.fna.gz"
    with gzip.open(path, "wt") as f:
        f.write(">a\nACGT\n")
    assert [s.seq for s in read_fasta(path)] == ["ACGT"]


def test_check_fasta(tmp_fasta):
    assert sequence.check_fasta(tmp_fasta([("a", "ACGT"), ("b", "ACGT")]))
    assert not sequence.check_fasta(tmp_fasta([("a", "ACGT"), ("a", "ACGT")], "dup.fna"))


def test_seq_windows():
    seq = Sequence("s", "A" * 14000)
    wins = list(seq_windows(seq, 6000, 2500))
    assert [len(w) for w in wins] == [6000, 6000]  # 2000 bp tail dropped
    seq = Sequence("s", "A" * 1000)
    wins = list(seq_windows(seq, 6000, 2500))
    assert [len(w) for w in wins] == [1000]  # first window forced
    seq = Sequence("s", "A" * 14500)
    wins = list(seq_windows(seq, 6000, 2500, max_windows=1))
    assert len(wins) == 1


def test_rc_and_terminal_repeats():
    s = Sequence("s", "ACGTN")
    assert s.rc().seq == "NACGT"
    repeat = "ACGTACGTACGTACGTACGTA"  # 21 bp
    middle = "GGGCCCGGGCCCGGGCCCGGGCCCGGGCCC"
    assert Sequence("dtr", repeat + middle + repeat).has_dtr()
    assert not Sequence("no", repeat + middle).has_dtr()
    rc_repeat = Sequence("t", repeat).rc().seq
    assert Sequence("itr", repeat + middle + rc_repeat).has_itr()


def test_sequence_str_wraps_60_cols():
    s = Sequence("name desc", "A" * 130)
    lines = str(s).splitlines()
    assert lines[0] == ">name desc"
    assert [len(l) for l in lines[1:]] == [60, 60, 10]
