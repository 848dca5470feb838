"""Prodigal training-profile tables: binary round-trip, pluggable scoring,
meta-mode model selection (VERDICT r2 #3: the gene-calling DP must consume
external trained tables end-to-end, with coordinate changes tracking the
tables)."""

import numpy as np
import pytest

from genomad_tpu.ops import gene_calling as gc
from genomad_tpu.ops import prodigal_model as pm


def test_training_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    ti = pm.TrainingInfo(
        gc=0.61,
        translation_table=4,
        start_weight=4.35,
        bias=rng.normal(size=3),
        type_weights=rng.normal(size=3),
        uses_sd=False,
        rbs_weights=rng.normal(size=28),
        upstream_compositions=rng.normal(size=(32, 4)),
        motif_weights=rng.normal(size=(4, 4, 4096)),
        no_motif_weight=-1.25,
        gene_dc=rng.normal(size=4096),
    )
    path = tmp_path / "model.tr"
    ti.dump(path)
    assert path.stat().st_size == pm._TOTAL_SIZE  # prodigal struct size
    back = pm.TrainingInfo.load(path)
    assert back.gc == pytest.approx(ti.gc)
    assert back.translation_table == 4
    assert back.start_weight == pytest.approx(ti.start_weight)
    assert back.uses_sd is False
    np.testing.assert_array_equal(back.bias, ti.bias)
    np.testing.assert_array_equal(back.type_weights, ti.type_weights)
    np.testing.assert_array_equal(back.rbs_weights, ti.rbs_weights)
    np.testing.assert_array_equal(
        back.upstream_compositions, ti.upstream_compositions
    )
    np.testing.assert_array_equal(back.motif_weights, ti.motif_weights)
    assert back.no_motif_weight == pytest.approx(ti.no_motif_weight)
    np.testing.assert_array_equal(back.gene_dc, ti.gene_dc)


def test_load_rejects_wrong_size(tmp_path):
    p = tmp_path / "bad.tr"
    p.write_bytes(b"\0" * 100)
    with pytest.raises(ValueError, match="expected"):
        pm.TrainingInfo.load(p)


def test_shine_dalgarno_bins():
    # perfect AGGAGG at 5-10bp spacer is the strongest bin
    b_strong = pm.shine_dalgarno_bin("AGGAGG" + "C" * 7)
    assert pm.BIN_NAMES[b_strong][0] == "AGGAGG"
    # weak GGA with 3-4bp spacer lands in a low bin
    b_weak = pm.shine_dalgarno_bin("CCCCCCCGGACCC")
    assert 0 < b_weak < b_strong
    # nothing upstream -> bin 0
    assert pm.shine_dalgarno_bin("CCCCCCCCCCCC") == 0


def test_upstream_score_offset_mapping():
    """ups_comp rows map to upstream offsets 1-2 and 15-44 — the RBS region
    proper (offsets 3-14) is never scored, which is why the table has
    exactly 32 rows (Prodigal node.c score_upstream_composition)."""
    ti = pm.TrainingInfo(gc=0.5, translation_table=11)
    comp = np.zeros((32, 4))
    ti.upstream_compositions = comp
    ti.start_weight = 2.5  # 0.4 * start_weight == 1.0 -> raw table sums
    up = "A" * 45  # every scored offset sees base A (index 0)

    comp[0][0] = 1.0  # row 0 -> offset 1 (base immediately 5' of the start)
    assert pm.upstream_score(ti, up) == pytest.approx(1.0)
    assert pm.upstream_score(ti, "A") == pytest.approx(1.0)

    comp[:] = 0.0
    comp[2][0] = 1.0  # row 2 -> offset 15, NOT offset 3
    assert pm.upstream_score(ti, up) == pytest.approx(1.0)
    # a 14-base window covers only offsets 1-14: rows 2+ never score
    assert pm.upstream_score(ti, "A" * 14) == 0.0

    comp[:] = 0.0
    comp[31][0] = 1.0  # last row -> offset 44
    assert pm.upstream_score(ti, "A" * 44) == pytest.approx(1.0)
    assert pm.upstream_score(ti, "A" * 43) == 0.0


def test_vectorized_scoring_matches_scalar(rng):
    """The array scoring kernels behind _call_genes_with_tables must agree
    with the retained scalar reference functions on random sequences:
    candidate enumeration, SD bins, motif maxima, upstream composition."""
    ti = pm.TrainingInfo(gc=0.5, translation_table=11)
    ti.upstream_compositions = rng.normal(size=(32, 4))
    ti.motif_weights = rng.normal(size=(4, 4, 4096))
    ti.no_motif_weight = -1.5
    seq = "".join(rng.choice(list("ACGTN"), 3000, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    upper = seq.upper()
    codes = gc._BASE_LUT[np.frombuffer(upper.encode(), np.uint8)]

    # candidate enumeration: arrays == generator, in order
    got = list(zip(*(a.tolist() for a in gc._candidate_arrays(seq, 11))))
    want = [
        (b, e, pb, pe, 3 if st == "Edge" else gc._START_TYPE_IDX[st])
        for b, e, pb, pe, st in gc._find_orfs(seq, 11)
    ]
    assert [(b, e, bool(pb), bool(pe), st) for b, e, pb, pe, st in got] == want

    begins = np.array(sorted({b for b, *_ in want}), np.int64)
    # SD bins per position == scalar shine_dalgarno_bin on upstream[-20:]
    sd = pm.sd_bins_at(codes)
    for b in begins.tolist():
        upstream = upper[max(0, b - 45): b]
        assert sd[b] == pm.shine_dalgarno_bin(upstream[-20:]), b
    # upstream composition == scalar
    np.testing.assert_allclose(
        pm.upstream_scores(ti, codes, begins),
        [pm.upstream_score(ti, upper[max(0, b - 45): b]) for b in begins],
        rtol=0, atol=1e-9,
    )
    # motif maxima (non-SD path) == scalar motif_score incl. the floor
    mot = np.maximum(pm.motif_best_at(ti, codes), ti.no_motif_weight)
    np.testing.assert_allclose(
        mot[begins],
        [pm.motif_score(ti, upper[max(0, b - 45): b]) for b in begins],
        rtol=0, atol=1e-12,
    )


def _hexamer_table_for(proteins: list[str]) -> np.ndarray:
    """A gene_dc table that rewards exactly the given proteins' codons."""
    from tests.test_gene_calling import reverse_translate

    model = gc.HexamerModel()
    arrs = []
    for p in proteins:
        cds = "ATG" + reverse_translate(p[1:]) + "TAA"
        arrs.append(gc._BASE_LUT[np.frombuffer(cds.encode(), np.uint8)])
    bg = np.ones(4096)
    model.train(arrs * 30, bg)  # repeat to clear MIN_TRAINING_HEXAMERS
    return np.asarray(model.log_ratio, np.float64)


def test_coordinates_track_swapped_tables(rng):
    """Swapping the trained tables swaps the called coordinates: a table
    trained on gene A picks A's reading frame out of a two-frame tangle; a
    table trained on gene B picks B's."""
    from tests.test_gene_calling import make_gene, random_intergenic

    prot_a = "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKTEDGKLVITGDAKDLDAIKALVEEGAKLAEELGIKLEDL"
    prot_b = "MSTKEQILEAIKELSPEQLAQVLDWAEKLGIELSEEEIKEAIKAVEKSGLKVSDEELAEVAGLSREEVEALKK"
    seq = (
        random_intergenic(rng, 120)
        + make_gene(prot_a[1:])
        + random_intergenic(rng, 150)
        + make_gene(prot_b[1:])
        + random_intergenic(rng, 120)
    )
    ti_a = pm.TrainingInfo(gc=0.5, translation_table=11)
    ti_a.gene_dc = _hexamer_table_for([prot_a])
    ti_a.type_weights = np.array([0.3, 0.05, -0.05])
    ti_a.rbs_weights = np.linspace(0.0, 1.0, 28)
    ti_b = pm.TrainingInfo(gc=0.5, translation_table=11)
    ti_b.gene_dc = _hexamer_table_for([prot_b])
    ti_b.type_weights = ti_a.type_weights
    ti_b.rbs_weights = ti_a.rbs_weights

    genes_a = gc._call_genes_with_tables(seq, ti_a)
    genes_b = gc._call_genes_with_tables(seq, ti_b)
    trans_a = [g.translate() for g in genes_a]
    trans_b = [g.translate() for g in genes_b]
    assert any(prot_a[1:] in t for t in trans_a)
    assert any(prot_b[1:] in t for t in trans_b)
    # scores follow the table: A's planted gene outscores under ti_a
    score_a_under_a = max(
        (g.score for g in genes_a if prot_a[1:] in g.translate()), default=0
    )
    score_a_under_b = max(
        (g.score for g in genes_b if prot_a[1:] in g.translate()), default=0
    )
    assert score_a_under_a > score_a_under_b
    # coordinates differ between the two table sets somewhere
    coords_a = {(g.begin, g.end, g.strand) for g in genes_a}
    coords_b = {(g.begin, g.end, g.strand) for g in genes_b}
    assert coords_a != coords_b


def test_meta_mode_selects_matching_model(rng):
    """The meta-mode loop picks the pretrained model whose tables match
    the contig (prodigal meta-mode structure)."""
    from tests.test_gene_calling import make_gene, random_intergenic

    prot = "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKTEDGKLVITGDAKDLDAIKALVEEGAKLAEELGIKLEDL"
    seq = (
        random_intergenic(rng, 100) + make_gene(prot[1:]) + random_intergenic(rng, 100)
    )
    good = pm.TrainingInfo(gc=gc._gc_content(seq), translation_table=11)
    good.gene_dc = _hexamer_table_for([prot])
    good.type_weights = np.array([0.3, 0.05, -0.05])
    bad = pm.TrainingInfo(gc=gc._gc_content(seq), translation_table=11)
    bad.gene_dc = -_hexamer_table_for([prot])  # anti-model
    bad.type_weights = good.type_weights

    finder = gc.GeneFinder(models=[bad, good], try_alt_codes=False)
    genes = finder.find_genes(seq)
    assert any(prot[1:] in g.translate() for g in genes)


def test_fallback_tables_flow_through_traininginfo(rng):
    """The self-trained path must route through the same TrainingInfo
    scoring machinery (one DP implementation for every table source)."""
    from tests.test_gene_calling import make_gene, random_intergenic

    prot = "MAKLVINLDGSKQRITLTPEQAEQLAKELGVEIKTEDGKLVITGDAKDLDAIKALVEEGAKLAEELGIKLEDL"
    seq = (
        random_intergenic(rng, 100) + make_gene(prot[1:]) + random_intergenic(rng, 100)
    )
    finder = gc.GeneFinder([seq], try_alt_codes=False)
    assert not finder.pretrained  # no *.tr files in the repo by default
    ti = pm.from_hexamer_model(finder._model(11), code=11)
    direct = gc._call_genes_with_tables(seq, ti)
    via_finder = finder.find_genes(seq)
    assert [(g.begin, g.end, g.strand) for g in direct] == [
        (g.begin, g.end, g.strand) for g in via_finder
    ]
