import os

import numpy as np
import pytest

from pepr_tpu.alphabet import AA_ORDER, GAP, PAD, X, decode, encode
from pepr_tpu.data.blosum62 import BLOSUM62, blosum62_matrix
from pepr_tpu.data.wag import (WAG_FREQS, WAG_RATES, wag_eigensystem,
                               wag_rate_matrix)
from pepr_tpu.io.fasta import (pack_padded, read_fasta, taxon_from_title,
                               write_fasta)
from pepr_tpu.utils.cli import RunProperties


def test_encode_decode_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYV"
    assert decode(encode(s)) == s
    assert list(encode(s)) == list(range(20))
    assert encode("-")[0] == GAP
    assert encode("U")[0] == X
    assert decode(encode("acd")) == "ACD"


def test_blosum62_matches_reference_data_file():
    ref = "/root/reference/BLOSUM62"
    if not os.path.exists(ref):
        pytest.skip("no reference data file")
    rows = []
    order = None
    with open(ref) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            if order is None:
                order = line.split()
                continue
            rows.append(line.split())
    col_of = {aa: i for i, aa in enumerate(order)}
    for i, aa_i in enumerate(AA_ORDER):
        for j, aa_j in enumerate(AA_ORDER):
            ref_val = int(rows[col_of[aa_i]][1 + col_of[aa_j]])
            assert BLOSUM62[i, j] == ref_val, (aa_i, aa_j)


def test_blosum62_full_matrix_pads():
    m = blosum62_matrix()
    assert m.shape == (25, 25)
    assert m[PAD, 0] == 0 and m[0, PAD] == 0
    assert m[0, 0] == 4


def test_wag_rate_matrix_properties():
    q = wag_rate_matrix()
    assert np.allclose(q.sum(axis=1), 0, atol=1e-12)
    # detailed balance: pi_i q_ij == pi_j q_ji
    pi = WAG_FREQS
    lhs = pi[:, None] * q
    assert np.allclose(lhs, lhs.T, atol=1e-12)
    # normalized expected rate == 1
    assert np.isclose(-(pi * np.diag(q)).sum(), 1.0)
    assert np.allclose(WAG_RATES, WAG_RATES.T)
    assert np.isclose(WAG_FREQS.sum(), 1.0, atol=1e-6)


def test_wag_eigensystem_reconstructs_transition_matrix():
    eig, u, u_inv = wag_eigensystem()
    q = wag_rate_matrix()
    assert np.allclose(u @ np.diag(eig) @ u_inv, q, atol=1e-10)
    # P(t) rows sum to 1, all entries positive
    for t in (0.01, 0.1, 1.0, 5.0):
        p = u @ np.diag(np.exp(eig * t)) @ u_inv
        assert np.allclose(p.sum(axis=1), 1.0, atol=1e-9)
        assert (p > -1e-12).all()
    # P(0) == I
    p0 = u @ u_inv
    assert np.allclose(p0, np.eye(20), atol=1e-10)


def test_taxon_from_title():
    t = "fid|143054122|locus|VBIAllSte209012_0001|   Cell division protein FtsH (EC 3.4.24.-)   [Allobaculum stercoricanis DSM 13633]"
    assert taxon_from_title(t) == "Allobaculum_stercoricanis_DSM_13633"
    assert taxon_from_title("plain title") == "plain_title"
    assert taxon_from_title(">seq1 [Genus sp. [strain A]]") == "Genus_sp._strain_A_"


def test_read_fasta_example(example_dir):
    path = os.path.join(example_dir,
                        "Allobaculum_stercoricanis_DSM_13633.PATRIC.faa")
    ss = read_fasta(path)
    assert len(ss) > 1000
    assert ss.taxon == "Allobaculum_stercoricanis_DSM_13633"
    assert ss.distinct_taxa() == ["Allobaculum_stercoricanis_DSM_13633"]
    assert all(len(s) > 0 for s in ss.seqs)
    assert ss.index_of_id(ss.ids[5]) == 5


def test_fasta_roundtrip(tmp_path):
    from pepr_tpu.io.fasta import SequenceSet
    ss = SequenceSet("t", ["a [Tax A]", "b [Tax B]"],
                     [encode("ACDEF"), encode("MNPQ")])
    p = str(tmp_path / "t.faa")
    write_fasta(p, ss)
    back = read_fasta(p)
    assert back.titles == ss.titles
    assert back.sequence_strings() == ["ACDEF", "MNPQ"]


def test_pack_padded():
    codes, lens = pack_padded([encode("ACD"), encode("ACDEFGH")])
    assert codes.shape == (2, 128)
    assert list(lens) == [3, 7]
    assert codes[0, 3] == PAD
    assert decode(codes[1][:7]) == "ACDEFGH"


def test_run_properties():
    rp = RunProperties(["-genome_file", "a.faa", "b.faa", "-refine",
                        "true", "-cutoff", "-3"])
    assert rp.values("genome_file") == ["a.faa", "b.faa"]
    assert rp.get_bool("refine")
    assert rp.get("cutoff") == "-3"
    rp.add("refine", "false")
    assert not rp.get_bool("refine")  # newest wins
    assert rp.get_int("missing", 7) == 7


def test_run_properties_roundtrip(tmp_path):
    rp = RunProperties(["-a", "1", "2", "-b", "x"])
    p = str(tmp_path / "run.clp")
    rp.save(p)
    back = RunProperties.load(p)
    assert back.values("a") == ["1", "2"]
    assert back.get("b") == "x"


def test_merge_precedence():
    preset = RunProperties(["-tree_method", "ml", "-reps", "100"])
    explicit = RunProperties(["-tree_method", "fasttree"])
    merged = preset.merged_under(explicit)
    assert merged.get("tree_method") == "fasttree"
    assert merged.get_int("reps") == 100
