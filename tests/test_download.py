"""Turnkey download flow, exercised hermetically over file:// URLs:
resolve version from releases.txt -> stream tarball with md5 check ->
extract -> auto-build the packed profile DBs from MMseqs2-format files.

The MMseqs2 profile files are synthesized byte-level per the serialization
documented in genomad_tpu/ops/mmseqs_io.py (per-position records of
20 int8 scores + metadata bytes); the packed output is checked against
the known PSSM values.
"""

from __future__ import annotations

import hashlib
import tarfile

import numpy as np
import pytest

from genomad_tpu.ops import mmseqs_io
from genomad_tpu.ops.profiledb import N_AA, ProfileDB


def write_mmseqs_profile_db(db_dir, base, pssms, names, taxids, record_size=25, trailing_nul=True):
    """Write an MMseqs2-layout profile DB: data file + .index/.lookup/_mapping."""
    db_dir.mkdir(parents=True, exist_ok=True)
    data = bytearray()
    index_lines, lookup_lines, mapping_lines = [], [], []
    for entry_id, (pssm, name, taxid) in enumerate(zip(pssms, names, taxids)):
        offset = len(data)
        for row in pssm:
            rec = bytearray(record_size)
            rec[:N_AA] = np.round(np.asarray(row) * 4.0).astype(np.int8).tobytes()
            rec[N_AA] = 3  # query residue
            rec[N_AA + 1] = 3  # consensus residue
            rec[N_AA + 2] = 1  # neff
            data.extend(rec)
        if trailing_nul:
            data.append(0)
        length = len(data) - offset
        index_lines.append(f"{entry_id}\t{offset}\t{length}")
        lookup_lines.append(f"{entry_id}\t{name}\t0")
        mapping_lines.append(f"{entry_id}\t{taxid}")
    (db_dir / base).write_bytes(bytes(data))
    (db_dir / f"{base}.index").write_text("\n".join(index_lines) + "\n")
    (db_dir / f"{base}.lookup").write_text("\n".join(lookup_lines) + "\n")
    (db_dir / f"{base}_mapping").write_text("\n".join(mapping_lines) + "\n")


@pytest.fixture
def mmseqs_fixture(tmp_path):
    rng = np.random.default_rng(42)
    pssms = [
        (rng.integers(-12, 16, size=(L, N_AA)) / 4.0).astype(np.float32)
        for L in (30, 45, 60)
    ]
    names = ["GENOMAD.000001.VV", "GENOMAD.000002.CC", "GENOMAD.000003.PP"]
    taxids = [0, 40, 10]
    return pssms, names, taxids


@pytest.mark.parametrize("record_size", [23, 25])
def test_convert_mmseqs_profile_db(tmp_path, mmseqs_fixture, record_size):
    pssms, names, taxids = mmseqs_fixture
    write_mmseqs_profile_db(tmp_path, "genomad_db", pssms, names, taxids, record_size)
    db = mmseqs_io.convert_mmseqs_profile_db(tmp_path / "genomad_db")
    assert db.n_profiles == 3
    assert list(db.names) == names
    assert list(db.taxids) == taxids
    for i, pssm in enumerate(pssms):
        np.testing.assert_array_equal(db.profile(i), pssm)


def test_convert_split_data_files(tmp_path, mmseqs_fixture):
    """Large DBs ship split data files (genomad_db.0, .1, ...)."""
    pssms, names, taxids = mmseqs_fixture
    write_mmseqs_profile_db(tmp_path, "genomad_db", pssms, names, taxids)
    data = (tmp_path / "genomad_db").read_bytes()
    (tmp_path / "genomad_db").unlink()
    half = len(data) // 2
    (tmp_path / "genomad_db.0").write_bytes(data[:half])
    (tmp_path / "genomad_db.1").write_bytes(data[half:])
    db = mmseqs_io.convert_mmseqs_profile_db(tmp_path / "genomad_db")
    for i, pssm in enumerate(pssms):
        np.testing.assert_array_equal(db.profile(i), pssm)


def test_turnkey_download_flow(tmp_path, mmseqs_fixture, monkeypatch):
    """download-database over a file:// endpoint: version resolution,
    md5 verification, extraction, and automatic packed-DB build."""
    from genomad_tpu.modules import download

    pssms, names, taxids = mmseqs_fixture

    # --- build the "remote" endpoint directory ---
    remote = tmp_path / "remote"
    remote.mkdir()
    staging = tmp_path / "staging" / "genomad_db"
    for base in ("genomad_db", "genomad_mini_db", "genomad_integrase_db"):
        write_mmseqs_profile_db(staging, base, pssms, names, taxids)
    (staging / "version.txt").write_text("1.9\n")
    tarball = remote / "genomad_db_v1.9.tar.gz"
    with tarfile.open(tarball, "w:gz") as tar:
        tar.add(staging, arcname="genomad_db")
    (remote / "releases.txt").write_text(
        "database\tpackage\n1.9\t1.9\n1.8\t1.8\n"
    )
    md5 = hashlib.md5(tarball.read_bytes()).hexdigest()
    (remote / "genomad_db_v1.9.tar.gz.md5").write_text(f"{md5}  {tarball.name}\n")

    monkeypatch.setenv("GENOMAD_TPU_DB_URL", remote.as_uri() + "/")

    dest = tmp_path / "dest"
    download.main(dest, keep=False, verbose=False)

    db_dir = dest / "genomad_db"
    assert (db_dir / "version.txt").exists()
    assert not (dest / "genomad_db_v1.9.tar.gz").exists()  # keep=False
    for _, packed in mmseqs_io.PACKED_TARGETS:
        assert (db_dir / packed).exists(), f"{packed} was not auto-built"
    db = ProfileDB.load(db_dir / "genomad_profiles.npz")
    assert list(db.names) == names
    np.testing.assert_array_equal(db.profile(1), pssms[1])


def test_database_packs_mmseqs_files_on_first_use(tmp_path, mmseqs_fixture):
    """A manually-extracted DB dir (MMseqs2 files only, e.g. from the
    Zenodo mirror) must be usable directly: Database packs it on first
    access and persists the packed file."""
    from genomad_tpu.database import Database

    pssms, names, taxids = mmseqs_fixture
    db_dir = tmp_path / "genomad_db"
    write_mmseqs_profile_db(db_dir, "genomad_db", pssms, names, taxids)
    (db_dir / "version.txt").write_text("1.9\n")

    db = Database(db_dir).get_profile_db()
    assert list(db.names) == names
    assert (db_dir / "genomad_profiles.npz").exists()
    # second access loads the persisted packed file
    db2 = Database(db_dir).get_profile_db()
    np.testing.assert_array_equal(db2.profile(2), pssms[2])


def test_download_md5_mismatch_rejects(tmp_path, mmseqs_fixture, monkeypatch):
    from genomad_tpu.modules import download

    pssms, names, taxids = mmseqs_fixture
    remote = tmp_path / "remote"
    remote.mkdir()
    staging = tmp_path / "staging" / "genomad_db"
    write_mmseqs_profile_db(staging, "genomad_db", pssms, names, taxids)
    tarball = remote / "genomad_db_v1.9.tar.gz"
    with tarfile.open(tarball, "w:gz") as tar:
        tar.add(staging, arcname="genomad_db")
    (remote / "releases.txt").write_text("database\tpackage\n1.9\t1.9\n")
    (remote / "genomad_db_v1.9.tar.gz.md5").write_text("0" * 32 + "\n")

    monkeypatch.setenv("GENOMAD_TPU_DB_URL", remote.as_uri() + "/")
    with pytest.raises(RuntimeError, match="md5 mismatch"):
        download.main(tmp_path / "dest", keep=False, verbose=False)
    assert not (tmp_path / "dest" / "genomad_db_v1.9.tar.gz").exists()
