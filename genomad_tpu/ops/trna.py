"""tRNA detection (ARAGORN functional analog).

The reference shells out to the ARAGORN C binary with ``-l -ps105 -w``
(genomad/aragorn.py:19-32) and parses ``tRNA-Xxx c[start,end]`` records into
``<contig>_tRNA<i>_<aa>\\tstart\\tend`` rows (aragorn.py:34-54). tRNA
coordinates only feed provirus boundary refinement (max 5 kb extension,
find_proviruses.py:675-683).

This module implements a structure-anchored cloverleaf detector:

  * anchor: the T-loop TTC motif (T54-Psi55-C56 of the canonical fold);
  * from the anchor, fixed-geometry 3' arm (T-stem 5 bp, acceptor stem 7 bp,
    discriminator) and variable-geometry 5' arm (D-loop + variable-loop
    slack, wide enough for type II long-variable-arm tRNAs) are scored by
    Watson-Crick/GU base-pairing in all FOUR stems (21 pairable positions:
    acceptor 7 + D 4 + anticodon 5 + T 5), each with a per-stem minimum;
  * candidates above the pairing threshold (19/21 at the -ps105 operating
    point; sensitivity 1.00 on architecture-generated type I+II genes,
    0.95 with 2 stem mismatches, ~1 false call per 200 kb of random DNA —
    tests/test_trna.py) are reported with the amino acid decoded from the
    anticodon; both strands are scanned; overlapping calls keep the best
    score.

Output rows match the reference's parsed format exactly.
"""

from __future__ import annotations

from pathlib import Path

from genomad_tpu import sequence as seqlib

_PAIRS = {
    ("A", "T"), ("T", "A"), ("G", "C"), ("C", "G"), ("G", "T"), ("T", "G"),
}

_AA3 = {
    "A": "Ala", "R": "Arg", "N": "Asn", "D": "Asp", "C": "Cys", "Q": "Gln",
    "E": "Glu", "G": "Gly", "H": "His", "I": "Ile", "L": "Leu", "K": "Lys",
    "M": "Met", "F": "Phe", "P": "Pro", "S": "Ser", "T": "Thr", "W": "Trp",
    "Y": "Tyr", "V": "Val", "*": "SeC", "X": "Pyl",
}

MIN_PAIR_SCORE = 19  # of 21 stem positions (the -ps105 operating point)


def _n_pairs(a: str, b_reversed: str) -> int:
    return sum((x, y) in _PAIRS for x, y in zip(a, b_reversed[::-1]))


def _anticodon_to_aa(anticodon: str) -> str:
    from genomad_tpu.ops.gene_calling import translate

    codon = seqlib.Sequence("x", anticodon).rc().seq
    aa = translate(codon, 11)
    return _AA3.get(aa, "Und")


def _scan_strand(seq: str, min_score: int = MIN_PAIR_SCORE):
    """Yield (start0, end0_inclusive, score, aa) candidate tRNAs on the
    given strand.

    Geometry ranges cover both tRNA classes: the 5' arm search reaches 65
    nt upstream of the T-loop anchor so type II tRNAs (Leu/Ser/SeC, long
    variable arms of ~10-16 nt) are inside the window, and the anticodon
    arm offset spans D-loops of 7-13 nt."""
    n = len(seq)
    m = seq.find("TTC")
    while m != -1:
        best = None
        if m >= 46 and m + 19 < n:
            t_stem = _n_pairs(seq[m - 5 : m], seq[m + 7 : m + 12])
            if t_stem >= 4:
                acc3 = seq[m + 12 : m + 19]
                for start in range(m - 65, m - 45):
                    if start < 0:
                        continue
                    acc5 = seq[start : start + 7]
                    acc = _n_pairs(acc5, acc3)
                    if acc < 6:
                        continue
                    # anticodon arm: stem 5 bp + loop 7 nt + stem 5 bp
                    for q in range(start + 21, start + 31):
                        ac5 = seq[q : q + 5]
                        ac3 = seq[q + 12 : q + 17]
                        ac = _n_pairs(ac5, ac3)
                        if ac < 4:
                            continue
                        # D-stem: 4 bp after acceptor+spacer, closing at q
                        d_stem = _n_pairs(seq[start + 9 : start + 13], seq[q - 4 : q])
                        if d_stem < 3:
                            continue
                        score = t_stem + acc + ac + d_stem
                        if score >= min_score:
                            anticodon = seq[q + 7 : q + 10]
                            aa = _anticodon_to_aa(anticodon)
                            cand = (start, m + 19, score, aa)
                            if best is None or score > best[2]:
                                best = cand
        if best is not None:
            yield best
        m = seq.find("TTC", m + 1)


def find_trnas(seq: str, min_score: int = MIN_PAIR_SCORE) -> list[tuple[int, int, str]]:
    """Detected tRNAs as (start, end, aa) with 1-based inclusive forward
    coordinates, overlaps resolved by score."""
    seq = seq.upper()
    n = len(seq)
    candidates = []
    for s0, e0, score, aa in _scan_strand(seq, min_score):
        candidates.append((s0 + 1, e0 + 1, score, aa))
    rc = seqlib.Sequence("x", seq).rc().seq
    for s0, e0, score, aa in _scan_strand(rc, min_score):
        candidates.append((n - e0, n - s0, score, aa))
    # overlap resolution: best score wins
    candidates.sort(key=lambda c: -c[2])
    chosen: list[tuple[int, int, str]] = []
    for s, e, score, aa in candidates:
        if all(e < cs or s > ce for cs, ce, _ in chosen):
            chosen.append((s, e, aa))
    chosen.sort()
    return chosen


class Aragorn:
    """Driver with the reference wrapper's contract (genomad/aragorn.py:11-97):
    scans every contig of ``input_file`` and appends
    ``<contig>_tRNA<i>_<aa>\\t<start>\\t<end>`` rows to ``aragorn_output``."""

    def __init__(self, input_file: Path, aragorn_output: Path, score_threshold: float = 1.05):
        self.input_file = Path(input_file)
        self.aragorn_output = Path(aragorn_output)
        # ARAGORN's -psN relaxes/tightens the acceptance cutoff relative to
        # its default (N=100); the analog here scales the stem-pairing
        # minimum: 1.05 (the reference's -ps105) maps to MIN_PAIR_SCORE.
        self.score_threshold = score_threshold
        self.min_score = max(1, round(MIN_PAIR_SCORE * score_threshold / 1.05))

    def run_parallel_aragorn(self, threads: int | None = None) -> None:
        if self.aragorn_output.is_file():
            self.aragorn_output.unlink()
        with open(self.aragorn_output, "w") as fout:
            for seq in seqlib.read_fasta(self.input_file):
                for i, (start, end, aa) in enumerate(
                    find_trnas(seq.seq, self.min_score), 1
                ):
                    fout.write(f"{seq.accession}_tRNA{i}_{aa}\t{start}\t{end}\n")
