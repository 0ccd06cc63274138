import numpy as np
import pytest

from pepr_tpu.alphabet import encode
from pepr_tpu.io.alignio import (parse_alignment, parse_clustal,
                                 parse_fasta_alignment, parse_nexus,
                                 parse_phylip, write_clustal,
                                 write_fasta_alignment, write_nexus,
                                 write_phylip)
from pepr_tpu.models.congruence import (column_bipartitions,
                                        filter_congruent)
from pepr_tpu.models.msa import Alignment
from pepr_tpu.utils.stats import (kmeans_1d, mean, r_squared,
                                  standard_deviation, t_statistic,
                                  z_scores)

ALN = Alignment("a", ["Tax1", "Tax2", "Tax3"],
                np.stack([encode("MKV-A"), encode("MKVLA"),
                          encode("MQVLA")]))


def test_phylip_roundtrip():
    text = write_phylip(ALN)
    back = parse_phylip(text)
    assert back.n_seqs == 3 and back.length == 5
    assert (back.mat == ALN.mat).all()


def test_fasta_roundtrip():
    back = parse_fasta_alignment(write_fasta_alignment(ALN))
    assert back.taxa == ALN.taxa
    assert (back.mat == ALN.mat).all()


def test_clustal_roundtrip():
    back = parse_clustal(write_clustal(ALN))
    assert back.taxa == ALN.taxa
    assert (back.mat == ALN.mat).all()


def test_nexus_roundtrip():
    back = parse_nexus(write_nexus(ALN))
    assert back.taxa == ALN.taxa
    assert (back.mat == ALN.mat).all()


def test_parse_dispatch():
    assert parse_alignment(write_phylip(ALN)).length == 5
    assert parse_alignment(write_fasta_alignment(ALN)).length == 5
    assert parse_alignment(write_nexus(ALN)).length == 5
    assert parse_alignment(write_clustal(ALN)).length == 5


def test_phylip_name_collision():
    aln = Alignment("a", ["SameLongTaxonNameA", "SameLongTaxonNameB"],
                    np.stack([encode("MK"), encode("MQ")]))
    text = write_phylip(aln)
    names = [l.split()[0] for l in text.splitlines()[1:]]
    assert len(set(names)) == 2


def test_stats():
    assert mean([1, 2, 3]) == 2
    assert standard_deviation([2, 4, 4, 4, 5, 5, 7, 9]) == \
        pytest.approx(2.138, abs=1e-3)
    z = z_scores([1.0, 2.0, 3.0])
    assert z[1] == 0
    assert t_statistic([1, 2, 3], [1, 2, 3]) == 0
    centers, assign = kmeans_1d([1, 1.1, 0.9, 10, 10.2, 9.8], 2)
    assert np.allclose(centers, [1.0, 10.0], atol=0.1)
    assert len(set(assign[:3])) == 1 and len(set(assign[3:])) == 1
    assert r_squared([1, 2, 3, 4], [2, 4, 6, 8]) == pytest.approx(1.0)


def test_column_bipartitions():
    aln = Alignment("g", ["A", "B", "C", "D"],
                    np.array([[0, 0], [0, 0], [1, 1], [1, 2]],
                             dtype=np.int8))
    idx = {"A": 0, "B": 1, "C": 2, "D": 3}
    bips = column_bipartitions(aln, idx)
    # col 0: classes {A,B} and {C,D}; col 1: {A,B} only (C,D singletons)
    assert len(bips) == 3


def test_congruence_filter_drops_outlier(rng):
    from pepr_tpu.tree import parse_newick
    from pepr_tpu.utils.simulate import simulate_alignment
    tree1 = parse_newick("((A:0.1,B:0.1):0.2,(C:0.1,D:0.1):0.2,"
                         "(E:0.1,F:0.1):0.2);")
    tree2 = parse_newick("((A:0.1,E:0.1):0.2,(C:0.1,B:0.1):0.2,"
                         "(D:0.1,F:0.1):0.2);")  # conflicting history
    genes = []
    for g in range(9):
        codes, taxa = simulate_alignment(tree1, 80, rng)
        genes.append(Alignment(f"g{g}", taxa, codes))
    codes, taxa = simulate_alignment(tree2, 80, rng)
    genes.append(Alignment("outlier", taxa, codes))
    kept = filter_congruent(genes, drop_fraction=0.1)
    assert len(kept) == 9
    assert all(a.name != "outlier" for a in kept)


def test_setup_logfile_rolling_handler(tmp_path):
    import logging

    from pepr_tpu.utils.cli import setup_logfile

    path = str(tmp_path / "run.log")
    setup_logfile(path)
    try:
        logging.getLogger("pepr_tpu").info("stage line %d", 7)
        for h in logging.getLogger().handlers:
            h.flush()
        with open(path) as fh:
            text = fh.read()
        assert "stage line 7" in text
        assert "INFO" in text
    finally:  # detach so other tests' logging is unaffected
        root = logging.getLogger()
        for h in list(root.handlers):
            if getattr(h, "baseFilename", None) == path:
                root.removeHandler(h)
                h.close()
