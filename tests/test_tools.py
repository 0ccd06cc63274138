import numpy as np
import pytest

from pepr_tpu.alphabet import encode
from pepr_tpu.io.fasta import SequenceSet, write_fasta
from pepr_tpu.io.hits import read_blast8, write_blast8
from pepr_tpu.io.setextract import (extract_sets, parse_set_file,
                                    write_set_files)
from pepr_tpu.models.homology import HitTable, ProteinUniverse
from pepr_tpu.tools import (neighbor_masher, set_extractor, tree_comparison,
                            tree_support)


def _universe():
    g1 = SequenceSet("g1", ["p1 [T1]", "p2 [T1]"],
                     [encode("MKVLITG"), encode("ACDEFGH")])
    g2 = SequenceSet("g2", ["q1 [T2]", "q2 [T2]"],
                     [encode("MKVLITG"), encode("WWYYFFM")])
    return ProteinUniverse.build([g1, g2])


def test_blast8_roundtrip(tmp_path):
    u = _universe()
    hits = HitTable(np.array([0, 1]), np.array([2, 3]),
                    np.array([55.0, 40.0], np.float32),
                    np.array([25.5, 20.1]),
                    np.array([1e-12, 1e-5]),
                    np.array([100.0, 42.9]),
                    np.array([7, 7]))
    p = str(tmp_path / "hits.blast8")
    write_blast8(p, u, hits)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 2
    assert lines[0].split("\t")[0] == "p1"
    back = read_blast8(p, u)
    assert list(back.query) == [0, 1]
    assert list(back.target) == [2, 3]
    assert back.bits[0] == pytest.approx(25.5)


def test_set_extractor(tmp_path):
    u = _universe()
    set_file = tmp_path / "sets.txt"
    set_file.write_text("p1\tq1\np2\tq2\tmissing_id\n")
    sets = extract_sets(parse_set_file(str(set_file)), u.genomes)
    assert len(sets) == 2
    assert len(sets[0]) == 2
    assert len(sets[1]) == 2  # missing id skipped
    out = write_set_files(sets, str(tmp_path / "hg"))
    assert len(out) == 2


def test_set_extractor_cli(tmp_path, capsys):
    u = _universe()
    for g in u.genomes:
        write_fasta(str(tmp_path / f"{g.name}.faa"), g)
    (tmp_path / "sets.txt").write_text("p1\tq1\n")
    rc = set_extractor.main(["-set_file", str(tmp_path / "sets.txt"),
                             "-genome_file",
                             str(tmp_path / "g1.faa"),
                             str(tmp_path / "g2.faa"),
                             "-out_dir", str(tmp_path / "out")])
    assert rc == 0
    assert "wrote 1 set files" in capsys.readouterr().out


def test_tree_comparison_cli(tmp_path, capsys):
    (tmp_path / "t1.nwk").write_text("((A:1,B:1):1,(C:1,D:1):1);\n")
    (tmp_path / "t2.nwk").write_text("((A:1,C:1):1,(B:1,D:1):1);\n")
    rc = tree_comparison.main([str(tmp_path / "t1.nwk"),
                               str(tmp_path / "t2.nwk")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rf\t2" in out


def test_tree_support_cli(tmp_path, capsys):
    (tmp_path / "main.nwk").write_text("((A,B),(C,D));\n")
    (tmp_path / "sup.nwk").write_text("((A,B),(C,D));\n((A,B),(C,D));\n")
    rc = tree_support.main([str(tmp_path / "main.nwk"),
                            str(tmp_path / "sup.nwk")])
    assert rc == 0
    assert "2" in capsys.readouterr().out


def test_neighbor_masher_cli(tmp_path, capsys, rng):
    base = [rng.integers(0, 20, size=150).astype(np.int8)
            for _ in range(20)]
    for name, rate in (("A", 0.02), ("B", 0.05), ("C", 0.3)):
        seqs = []
        for b in base:
            s = b.copy()
            m = rng.random(len(s)) < rate
            s[m] = rng.integers(0, 20, size=m.sum())
            seqs.append(s)
        ss = SequenceSet(name, [f"{name}_{i} [{name}]"
                                for i in range(len(seqs))], seqs)
        write_fasta(str(tmp_path / f"{name}.faa"), ss)
    rc = neighbor_masher.main(["-genome_file",
                               str(tmp_path / "A.faa"),
                               str(tmp_path / "B.faa"),
                               str(tmp_path / "C.faa"), "-tree", "true"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip().endswith(";")


def test_homology_file_pipeline(tmp_path):
    """-homology_search_method <file>: precomputed hits skip the search."""
    from pepr_tpu.models.homology import (bidirectional_edges,
                                          search_all_vs_all)
    from pepr_tpu.pipeline.stage1 import Stage1Config, run_stage1
    rng = np.random.default_rng(0)
    from tests.test_homology import make_synthetic_genomes
    genomes, families = make_synthetic_genomes(rng)
    u, hits = search_all_vs_all(genomes, candidates_per_genome=2)
    p = str(tmp_path / "hits.blast8")
    write_blast8(p, u, hits)
    cfg = Stage1Config(homology_file=p, use_hmm=False, outgroup_count=0)
    res = run_stage1(genomes, [], cfg)
    got = sorted(tuple(sorted(
        [u.ids.index(i) for i in s.ids])) for s in res.hg_sets)
    want = sorted(tuple(sorted(f)) for f in families)
    assert got == want


def test_treebuilder_compare(tmp_path, rng):
    """TreeBuilderComparator.java:77-119 role: same alignment through
    several builders with timings + RF."""
    from pepr_tpu.tools.treebuilder_compare import compare_builders
    from pepr_tpu.tree import parse_newick
    from pepr_tpu.utils.simulate import simulate_alignment

    true = parse_newick(
        "(((A:0.15,B:0.12):0.1,(C:0.1,D:0.14):0.12):0.06,"
        "(E:0.12,F:0.1):0.06);")
    codes, taxa = simulate_alignment(true, 300, rng)
    res = compare_builders(codes, taxa, ["fast_ml", "nj"])
    assert res["alpha"] > 0
    assert res["fast_ml"]["log_likelihood"] >= res["nj"]["log_likelihood"] - 1.0
    assert "fast_ml-nj" in res["rf"]
    assert res["fast_ml"]["seconds"] > 0


def test_cli_r4_flags():
    """r4 CLI surface: nt alphabet, congruence, matrix evaluation,
    parsimony methods, named tracks (VERDICT r3 missing #5)."""
    from pepr_tpu.pipeline.cli import config_from_args
    c = config_from_args(["-genome_file", "x.faa", "-nt",
                          "-congruence_filter", "true",
                          "-matrix_eval", "WAG,LG",
                          "-tree_method", "parsimony"])
    assert c.alphabet == "nt"
    assert c.stage1.alphabet == "nt" and c.stage2.alphabet == "nt"
    assert c.stage2.congruence_filter is True
    assert c.stage2.matrix_evaluation == ["WAG", "LG"]
    assert c.stage2.full_tree_method == "parsimony"
    c2 = config_from_args(["-genome_file", "x.faa", "-alphabet", "nt",
                           "-matrix_eval", "-track", "blat_fast"])
    assert c2.alphabet == "nt"
    assert c2.stage2.matrix_evaluation is True
    assert c2.stage2.full_tree_method == "fast_ml"
    c3 = config_from_args(["-genome_file", "x.faa",
                           "-tree_method", "parsimony_bl"])
    assert c3.stage2.full_tree_method == "parsimony_bl"
