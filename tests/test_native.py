"""Native extension parity: the C++ fast paths must agree with the
pure-Python implementations bit-for-bit (same hashing, same masking)."""

import os

import numpy as np
import pytest

from pepr_tpu.native import (get_lib, native_connected_components,
                             native_kmer_profiles, native_read_fasta)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no g++?)")
    return lib


def test_native_read_fasta_matches_python(lib, tmp_path):
    p = tmp_path / "x.faa"
    p.write_text(">seq1 desc one [Tax A]\nACDEF\nGHIK\n"
                 ">seq2 [Tax B]\nMNPQRSTU\n\n>seq3 [Tax C]\nW\n")
    titles, seqs = native_read_fasta(str(p))
    os.environ["PEPR_NO_NATIVE"] = "1"
    try:
        import importlib

        import pepr_tpu.native as nat
        nat._tried = False
        nat._lib = None
        from pepr_tpu.io.fasta import read_fasta
        py = read_fasta(str(p))
    finally:
        del os.environ["PEPR_NO_NATIVE"]
        import pepr_tpu.native as nat
        nat._tried = False
        nat._lib = None
    assert titles == py.titles
    assert len(seqs) == len(py.seqs) == 3
    for a, b in zip(seqs, py.seqs):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_native_read_fasta_real_example(lib, example_dir):
    path = os.path.join(example_dir,
                        "Eubacterium_cylindroides_T2-87.PATRIC.faa")
    titles, seqs = native_read_fasta(path)
    assert len(titles) == len(seqs) > 1000
    assert all(len(s) > 0 for s in seqs)
    assert "[Eubacterium" in titles[0]


def test_native_kmer_profiles_match_python(lib, rng):
    seqs = [rng.integers(0, 22, size=int(rng.integers(3, 200))).astype(np.int8)
            for _ in range(40)]
    got = native_kmer_profiles(seqs, 4, 256, 3)
    os.environ["PEPR_NO_NATIVE"] = "1"
    try:
        import pepr_tpu.native as nat
        nat._tried = False
        nat._lib = None
        from pepr_tpu.ops.kmer_filter import kmer_profiles
        want = kmer_profiles(seqs, k=4, dim=256, clip=3)
    finally:
        del os.environ["PEPR_NO_NATIVE"]
        import pepr_tpu.native as nat
        nat._tried = False
        nat._lib = None
    assert np.allclose(got, want, atol=1e-6)


def test_native_connected_components(lib):
    comp = native_connected_components(6, np.array([0, 1, 3]),
                                       np.array([1, 2, 4]))
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert comp[5] != comp[0] and comp[5] != comp[3]
