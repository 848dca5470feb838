"""Native (C++) prefilter: build + parity with the numpy implementation."""

import numpy as np
import pytest

from genomad_tpu import native
from genomad_tpu.ops import protein_search
from genomad_tpu.ops.profiledb import ProfileDB, encode_protein


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_matches_numpy_prefilter(lib, rng):
    db = ProfileDB.synthetic(seed=31, n_profiles=60, min_len=60, max_len=150)
    index = db.kmer_index(1)
    for target in (0, 17, 59):
        residues = db.consensus(target)[:90]
        expected = protein_search.prefilter_query(residues, db, index, 25.0)
        got = native.native_prefilter_query(index, residues, db, 25.0)
        assert got is not None
        np.testing.assert_array_equal(np.sort(got), np.sort(expected))
        assert target in got
    # noise query: both paths agree
    noise = rng.integers(0, 20, 90).astype(np.int8)
    expected = protein_search.prefilter_query(noise, db, index, 25.0)
    got = native.native_prefilter_query(index, noise, db, 25.0)
    np.testing.assert_array_equal(np.sort(got), np.sort(expected))


def test_native_batch_matches_single(lib, rng):
    db = ProfileDB.synthetic(seed=41, n_profiles=40, min_len=60, max_len=120)
    index = db.kmer_index(1)
    residues_list = [db.consensus(t)[:80] for t in (2, 9, 33)]
    residues_list.append(rng.integers(0, 20, 70).astype(np.int8))
    batch = native.native_prefilter_batch(index, residues_list, db, 25.0, n_threads=2)
    assert batch is not None
    for residues, got in zip(residues_list, batch):
        single = native.native_prefilter_query(index, residues, db, 25.0)
        np.testing.assert_array_equal(np.sort(got), np.sort(single))


def test_native_handles_unknown_residues(lib):
    db = ProfileDB.synthetic(seed=5, n_profiles=20, min_len=60, max_len=100)
    index = db.kmer_index(1)
    residues = encode_protein("X" * 50)
    got = native.native_prefilter_query(index, residues, db, 25.0)
    assert got is not None and len(got) == 0
