"""Build the /tmp/e2e synthetic end-to-end fixture (DB dir + input FASTA).

The canonical verify fixture (see .claude/skills/verify): a synthetic
geNomad DB plus an input whose contigs carry back-translated profile
consensus genes with RBS sites, varied synonymous codons (so antisense
frames hit stops like real DNA), and stop-dense intergenic spacers. A
correct pipeline run yields nonzero marker hits in
out/input_annotate/input_mmseqs2.tsv.

Usage: python tools/make_e2e_fixture.py [ROOT=/tmp/e2e]
"""

import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu.ops.gene_calling import _CODON_TABLE_11  # noqa: E402
from genomad_tpu.ops.profiledb import ALPHABET, ProfileDB  # noqa: E402

_CODONS_FOR: dict[str, list[str]] = {}
for _i in range(64):
    _aa = _CODON_TABLE_11[_i]
    _bases = "ACGT"
    _codon = _bases[_i // 16] + _bases[(_i // 4) % 4] + _bases[_i % 4]
    _CODONS_FOR.setdefault(_aa, []).append(_codon)


def reverse_translate(protein: str, rng) -> str:
    return "".join(
        _CODONS_FOR[aa][rng.integers(0, len(_CODONS_FOR[aa]))] for aa in protein
    )


def main(root: Path = Path("/tmp/e2e")) -> None:
    shutil.rmtree(root, ignore_errors=True)
    db_dir = root / "genomad_db"
    db_dir.mkdir(parents=True)
    (db_dir / "version.txt").write_text("1.9\n")
    db = ProfileDB.synthetic(seed=17, n_profiles=40, min_len=60, max_len=120)
    db.taxids[:] = 0
    db.taxids[7] = 40
    db.save(db_dir / "genomad_profiles.npz")
    db.save(db_dir / "genomad_mini_profiles.npz")
    ProfileDB.synthetic(seed=99, n_profiles=4, min_len=60, max_len=90).save(
        db_dir / "genomad_integrase_profiles.npz"
    )
    header = "\t".join(
        ["marker", "c1", "class", "c3", "spm_c", "spm_p", "spm_v", "gv",
         "uscg", "ph", "vh", "conjscan", "amr", "acc", "desc", "t1", "t2"]
    )
    with open(db_dir / "genomad_marker_metadata.tsv", "w") as f:
        f.write(header + "\n")
        for i, name in enumerate(db.names):
            spec = "VV" if i % 2 else "CC"
            spm = ("0.1", "0.2", "0.9") if i % 2 else ("0.9", "0.2", "0.1")
            f.write(
                f"{name}\tx\t{spec}\tx\t{spm[0]}\t{spm[1]}\t{spm[2]}\t0\tNA\t0\t"
                f"{1 if i % 2 else 0}\tNA\tNA\tPF{i:05d}\tdesc{i}\tx\tx\n"
            )
    with open(db_dir / "nodes.dmp", "w") as f:
        for t, p, r in [(1, 1, "no rank"), (10, 1, "realm"), (20, 10, "kingdom"),
                        (30, 20, "phylum"), (40, 30, "class")]:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(db_dir / "names.dmp", "w") as f:
        for t, n in [(1, "root"), (10, "Duplodnaviria"), (20, "Heunggongvirae"),
                     (30, "Uroviricota"), (40, "Caudoviricetes")]:
            f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")

    rng = np.random.default_rng(5)

    def spacer(n: int) -> str:
        # stop-dense on both strands under all genetic codes
        return ("TTAA" * (n // 4 + 1))[:n]

    def gene_for(profile_i: int) -> str:
        aa = "".join(ALPHABET[r] for r in db.consensus(profile_i))
        return "AGGAGG" + "C" * 7 + "ATG" + reverse_translate(aa, rng) + "TAA"

    records = []
    for ci in range(6):
        parts = [spacer(300)]
        for k in range(3):
            parts.append(gene_for((2 * ci + k) % 40))
            parts.append(spacer(int(rng.integers(80, 160))))
        records.append((f"contig_{ci}", "".join(parts)))
    with open(root / "input.fna", "w") as f:
        for h, s in records:
            f.write(f">{h}\n{s}\n")
    print(f"fixture ready: {root}")


if __name__ == "__main__":
    main(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/e2e"))
