import numpy as np
import pytest

from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.models.neighbor_masher import (mash_distance, mash_nj_tree,
                                             minhash_sketch,
                                             select_outgroups_by_distance)
from pepr_tpu.models.treecompare import (branch_score_distance,
                                         compare_trees,
                                         per_site_log_likelihoods,
                                         restrict_to_common_taxa,
                                         sitelh_text)
from pepr_tpu.tree import parse_newick
from pepr_tpu.utils.simulate import simulate_alignment


def test_branch_score_distance_zero_for_identical():
    t = parse_newick("((A:1,B:2):0.5,(C:1,D:1):0.5);")
    assert branch_score_distance(t, t) == pytest.approx(0.0)


def test_branch_score_distance_positive():
    t1 = parse_newick("((A:1,B:2):0.5,(C:1,D:1):0.5);")
    t2 = parse_newick("((A:1,B:2):2.5,(C:1,D:1):0.5);")
    assert branch_score_distance(t1, t2, normalized=False) > 0


def test_restrict_common_taxa():
    t1 = parse_newick("((A:1,B:1):1,(C:1,D:1):1);")
    t2 = parse_newick("((A:1,B:1):1,(C:1,E:1):1);")
    a, b = restrict_to_common_taxa(t1, t2)
    assert sorted(a.leaf_labels()) == sorted(b.leaf_labels()) == \
        ["A", "B", "C"]


def test_compare_trees_dict():
    t1 = parse_newick("((A:1,B:1):1,(C:1,D:1):1);")
    t2 = parse_newick("((A:1,C:1):1,(B:1,D:1):1);")
    d = compare_trees(t1, t2)
    assert d["rf"] == 2
    assert d["common_taxa"] == 4


def test_per_site_lls_and_sitelh(rng):
    tree = parse_newick("((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1);")
    codes, taxa = simulate_alignment(tree, 40, rng)
    alt = parse_newick("((A:0.1,C:0.1):0.1,(B:0.1,D:0.1):0.1);")
    lls = per_site_log_likelihoods([tree, alt], codes, taxa)
    assert lls.shape == (2, 40)
    # the generating tree should fit better in total
    assert lls[0].sum() > lls[1].sum()
    text = sitelh_text(lls)
    assert text.startswith("  2  40")
    assert text.count("\n") == 3


def _genome(rng, name, base=None, rate=0.1, n=30, L=200):
    seqs = []
    for i in range(n):
        if base is not None:
            s = base[i].copy()
            m = rng.random(L) < rate
            s[m] = rng.integers(0, 20, size=m.sum())
        else:
            s = rng.integers(0, 20, size=L).astype(np.int8)
        seqs.append(s)
    return SequenceSet(name, [f"{name}_p{i} [{name}]" for i in range(n)],
                       seqs)


def test_minhash_distance_ordering(rng):
    base = [rng.integers(0, 20, size=200).astype(np.int8)
            for _ in range(30)]
    g1 = _genome(rng, "G1", base, 0.02)
    g2 = _genome(rng, "G2", base, 0.05)
    g3 = _genome(rng, "G3", base, 0.4)
    s1 = minhash_sketch(g1)
    s2 = minhash_sketch(g2)
    s3 = minhash_sketch(g3)
    assert mash_distance(s1, s2) < mash_distance(s1, s3)
    assert mash_distance(s1, s1) == pytest.approx(0.0, abs=1e-9)


def test_mash_nj_tree_and_outgroup_selection(rng):
    base = [rng.integers(0, 20, size=200).astype(np.int8)
            for _ in range(30)]
    a = _genome(rng, "A", base, 0.02)
    b = _genome(rng, "B", base, 0.03)
    c = _genome(rng, "C", base, 0.10)
    d = _genome(rng, "D", base, 0.12)
    far = _genome(rng, "FAR", base, 0.5)
    junk = _genome(rng, "JUNK")
    tree = mash_nj_tree([a, b, c, d, far])
    assert sorted(tree.leaf_labels()) == ["A", "B", "C", "D", "FAR"]
    picked = select_outgroups_by_distance([a, b, c, d], [junk, far],
                                          count=1)
    assert picked == ["FAR"]
