"""Feature extraction, database accessor, and taxonomy majority-vote tests
against hand-computed expectations."""

import numpy as np
import pytest

from genomad_tpu import database, taxonomy, utils
from genomad_tpu.ops import features
from genomad_tpu.paths import GenomadData

# Metadata columns (17): marker, x, spec_class, x, spm_c, spm_p, spm_v, gv,
# uscg, plasmid_hallmark, virus_hallmark, conjscan, amr, accession,
# description, x, x
_METADATA_HEADER = "\t".join(["marker", "c1", "class", "c3", "spm_c", "spm_p", "spm_v", "gv",
                              "uscg", "ph", "vh", "conjscan", "amr", "acc", "desc", "t1", "t2"])


@pytest.fixture
def fake_db(tmp_path):
    db_dir = tmp_path / "genomad_db"
    db_dir.mkdir()
    (db_dir / "version.txt").write_text("1.9\n")
    rows = [
        # marker, class, spm_c, spm_p, spm_v, gv, uscg, ph, vh, conjscan, amr
        ("GENOMAD.1", "VV", 0.0, 0.1, 0.9, 0, "NA", 0, 1, "NA", "NA", "PF00001", "terminase", 10),
        ("GENOMAD.2", "CC", 0.9, 0.1, 0.0, 0, "USCG1", 0, 0, "NA", "NA", "PF00002", "ribosomal", 2),
        ("GENOMAD.3", "PP", 0.1, 0.9, 0.0, 0, "NA", 1, 0, "T_virB4", "NF0001", "PF00003", "conjugation", 0),
    ]
    with open(db_dir / "genomad_marker_metadata.tsv", "w") as f:
        f.write(_METADATA_HEADER + "\n")
        for m, cl, sc, sp, sv, gv, uscg, ph, vh, conj, amr, acc, desc, taxid in rows:
            f.write(
                f"{m}\tx\t{cl}\tx\t{sc}\t{sp}\t{sv}\t{gv}\t{uscg}\t{ph}\t{vh}\t"
                f"{conj}\t{amr}\t{acc}\t{desc}\tx\tx\n"
            )
    # Minimal ICTV-style taxdump:
    # 1 root; 10 realm Duplodnaviria; 20 kingdom; 30 phylum; 40 class
    # Caudoviricetes; 50 family Straboviridae; 60 genus Tequatrovirus
    # 70 phylum Nucleocytoviricota (realm 11 Varidnaviria)
    nodes = [
        (1, 1, "no rank"),
        (10, 1, "realm"),
        (20, 10, "kingdom"),
        (30, 20, "phylum"),
        (40, 30, "class"),
        (50, 40, "family"),
        (60, 50, "genus"),
        (11, 1, "realm"),
        (21, 11, "kingdom"),
        (70, 21, "phylum"),
    ]
    names = [
        (1, "root"), (10, "Duplodnaviria"), (20, "Heunggongvirae"),
        (30, "Uroviricota"), (40, "Caudoviricetes"), (50, "Straboviridae"),
        (60, "Tequatrovirus"), (11, "Varidnaviria"), (21, "Bamfordvirae"),
        (70, "Nucleocytoviricota"),
    ]
    with open(db_dir / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(db_dir / "names.dmp", "w") as f:
        for t, n in names:
            f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")
    return db_dir


def test_database_accessors(fake_db):
    db = database.Database(fake_db)
    assert db.version == 1.9
    feats = db.get_marker_features()
    assert feats["GENOMAD.1"] == ("VV", 0.0, 0.1, 0.9, 0, 0, 0, 1)
    assert feats["GENOMAD.2"][0] == "CC" and feats["GENOMAD.2"][5] == 1  # USCG
    ann = db.get_marker_annotation()
    assert ann["GENOMAD.3"] == (0, 1, 0, "T_virB4", "NF0001", "PF00003", "conjugation")


def _write_genes_tsv(path, rows):
    header = (
        "gene\tstart\tend\tlength\tstrand\tgc_content\tgenetic_code\trbs_motif\tmarker\t"
        "evalue\tbitscore\tuscg\tplasmid_hallmark\tvirus_hallmark\ttaxid\ttaxname\t"
        "annotation_conjscan\tannotation_amr\tannotation_accessions\tannotation_description\n"
    )
    with open(path, "w") as f:
        f.write(header)
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def test_feature_array(fake_db, tmp_fasta, tmp_path):
    db = database.Database(fake_db)
    input_path = tmp_fasta([("ctg1", "ACGT" * 500)])  # 2000 bp
    genes_path = tmp_path / "genes.tsv"
    # 4 genes: 2 virus markers, 1 chromosome marker, 1 unannotated
    _write_genes_tsv(
        genes_path,
        [
            ("ctg1_1", 1, 300, 300, 1, 0.5, 11, "GGAGG", "GENOMAD.1", 1e-10, 100, 0, 0, 1, 10, "x", "NA", "NA", "PF1", "d"),
            ("ctg1_2", 301, 600, 300, 1, 0.5, 11, "None", "GENOMAD.1", 1e-10, 90, 0, 0, 1, 10, "x", "NA", "NA", "PF1", "d"),
            ("ctg1_3", 601, 900, 300, -1, 0.5, 11, "None", "GENOMAD.2", 1e-8, 80, 1, 0, 0, 1, "NA", "NA", "NA", "PF2", "d"),
            ("ctg1_4", 901, 1200, 300, -1, 0.5, 11, "TATATA", "NA", "NA", "NA", 0, 0, 0, 1, "NA", "NA", "NA", "NA", "NA"),
        ],
    )
    names, n_genes, n_uscg, n_hall, code, feats, enrich = features.get_feature_array(
        input_path, genes_path, db, GenomadData.rbs_file
    )
    assert names.tolist() == ["ctg1"]
    assert n_genes[0] == 4 and n_uscg[0] == 1
    assert n_hall[0].tolist() == [0, 2]
    assert code[0] == 11
    f = feats[0]
    assert f[0] == pytest.approx(1 / 3)  # one strand switch over 3 adjacencies
    assert f[1] == pytest.approx(1200 / 2000)  # coding density
    # RBS categories: GGAGG->SD_Canonical, None->None x2, TATATA->TATATA_3_6
    assert f[4] == pytest.approx(1 / 4)  # SD_Canonical freq
    assert f[2] == pytest.approx(2 / 4)  # no-RBS freq
    assert f[5] == pytest.approx(1 / 4)  # TATATA freq
    # specificity classes: VV x2, CC x1 over 4 genes
    assert f[14] == pytest.approx(2 / 4)  # VV freq
    assert f[6] == pytest.approx(1 / 4)  # CC freq
    assert f[17] == pytest.approx(2 / 4)  # V freq
    assert f[15] == pytest.approx(1 / 4)  # C freq
    # medians over the 3 marker genes
    assert f[18] == pytest.approx(np.median([0.0, 0.0, 0.9]))
    assert f[20] == pytest.approx(np.median([0.9, 0.9, 0.0]))
    # compound v_vs_c: sum(exp(spm_v) - exp(spm_c)) = 2*(e^0.9-1) + (1-e^0.9)
    expected_vc = 2 * (np.exp(0.9) - 1) + (1 - np.exp(0.9))
    assert f[21] == pytest.approx(utils.logistic(expected_vc, 2))
    # marker enrichment v: sum(exp(spm_v) - exp(spm_c + spm_p))
    expected_ev = (
        (np.exp(0.9) - np.exp(0.0 + 0.1)) * 2 + (np.exp(0.0) - np.exp(0.9 + 0.1))
    )
    assert enrich[0][2] == pytest.approx(expected_ev)


def test_taxonomy_majority_vote(fake_db):
    db = database.Database(fake_db)
    taxdb = db.get_taxdb()
    # Three genes vote genus 60, one votes phylum 70: family 50 wins at >50%
    taxa = [taxonomy.Taxon(60, taxdb)] * 3 + [taxonomy.Taxon(70, taxdb)]
    majority = taxonomy.find_majority_vote(taxa, taxdb, weights=[100, 100, 100, 100])
    assert majority.taxid == 60  # 75% support down to genus
    assert majority.agreement == pytest.approx(0.75)
    # With dominant weight on the dissenting gene the vote retreats to root
    majority = taxonomy.find_majority_vote(taxa, taxdb, weights=[10, 10, 10, 1000])
    assert majority.taxid == 70


def test_write_taxonomic_assignment(fake_db, tmp_path):
    db = database.Database(fake_db)
    genes_path = tmp_path / "genes.tsv"
    _write_genes_tsv(
        genes_path,
        [
            ("ctg1_1", 1, 300, 300, 1, 0.5, 11, "None", "GENOMAD.1", 1e-10, 100, 0, 0, 1, 60, "Tequatrovirus", "NA", "NA", "PF1", "d"),
            ("ctg1_2", 301, 600, 300, 1, 0.5, 11, "None", "GENOMAD.1", 1e-10, 100, 0, 0, 1, 60, "Tequatrovirus", "NA", "NA", "PF1", "d"),
            ("ctg1_3", 601, 900, 300, 1, 0.5, 11, "None", "NA", "NA", "NA", 0, 0, 0, 1, "NA", "NA", "NA", "NA", "NA"),
        ],
    )
    out = tmp_path / "taxonomy.tsv"
    taxonomy.write_taxonomic_assignment(out, genes_path, db)
    lines = out.read_text().splitlines()
    assert lines[0] == "seq_name\tn_genes_with_taxonomy\tagreement\ttaxid\tlineage"
    fields = lines[1].split("\t")
    assert fields[0] == "ctg1" and fields[1] == "2"
    # strict mode truncates genus 60 -> family 50
    assert fields[3] == "50"
    assert fields[4] == "Viruses;Duplodnaviria;Heunggongvirae;Uroviricota;Caudoviricetes;;Straboviridae"
    # lenient mode keeps the genus
    taxonomy.write_taxonomic_assignment(out, genes_path, db, lenient_taxonomy=True)
    fields = out.read_text().splitlines()[1].split("\t")
    assert fields[3] == "60"
    assert fields[4].endswith("Straboviridae;Tequatrovirus;")


def test_taxonomy_single_gene(fake_db, tmp_path):
    db = database.Database(fake_db)
    genes_path = tmp_path / "genes.tsv"
    _write_genes_tsv(
        genes_path,
        [("c_1", 1, 300, 300, 1, 0.5, 11, "None", "GENOMAD.1", 1e-10, 100, 0, 0, 1, 40, "Caudoviricetes", "NA", "NA", "PF1", "d")],
    )
    out = tmp_path / "taxonomy.tsv"
    taxonomy.write_taxonomic_assignment(out, genes_path, db)
    fields = out.read_text().splitlines()[1].split("\t")
    assert fields[1] == "1" and fields[2] == "1.0000" and fields[3] == "40"
