import math

import numpy as np
import pytest

from pepr_tpu.tree import (Tree, bipartitions, decorate_supports,
                           leaf_distance_matrix, mean_descendant_supports,
                           neighbor_joining, normalize_supports,
                           parse_newick, remove_taxa, replace_subtree,
                           reroot_on_edge, rf_distance, root_by_outgroup,
                           to_newick, unroot)
from pepr_tpu.tree.bipartition import taxon_index
from pepr_tpu.tree.rooting import compress_name

NWK = "((A:0.1,B:0.2)90:0.05,(C:0.3,(D:0.1,E:0.4)75:0.2)80:0.1);"


def test_parse_basic():
    t = parse_newick(NWK)
    t.validate()
    assert sorted(t.leaf_labels()) == ["A", "B", "C", "D", "E"]
    labels = {t.labels[i]: i for i in t.leaves()}
    assert t.blen[labels["B"]] == 0.2
    ab_parent = t.parent[labels["A"]]
    assert t.support[ab_parent] == 90
    assert t.blen[ab_parent] == pytest.approx(0.05)


def test_roundtrip():
    t = parse_newick(NWK)
    s = to_newick(t)
    t2 = parse_newick(s)
    assert sorted(t2.leaf_labels()) == sorted(t.leaf_labels())
    idx = taxon_index(sorted(t.leaf_labels()))
    assert bipartitions(t, idx) == bipartitions(t2, idx)
    d1, l1 = leaf_distance_matrix(t)
    d2, l2 = leaf_distance_matrix(t2)
    order = [l2.index(x) for x in l1]
    assert np.allclose(d1, d2[np.ix_(order, order)])


def test_bracket_support():
    t = parse_newick("((A:1,B:1)[88]:1,C:1);")
    p = t.parent[[i for i in t.leaves() if t.labels[i] == "A"][0]]
    assert t.support[p] == 88


def test_unroot_preserves_distances():
    t = parse_newick(NWK)
    u = unroot(t)
    assert len(u.children[u.root]) == 3
    d1, l1 = leaf_distance_matrix(t)
    d2, l2 = leaf_distance_matrix(u)
    order = [l2.index(x) for x in l1]
    assert np.allclose(d1, d2[np.ix_(order, order)])


def test_reroot_preserves_structure():
    t = parse_newick(NWK)
    u = unroot(t)
    leaf_c = [i for i in u.leaves() if u.labels[i] == "C"][0]
    r = reroot_on_edge(u, leaf_c, 0.5)
    r.validate()
    assert len(r.children[r.root]) == 2
    d1, l1 = leaf_distance_matrix(t)
    d2, l2 = leaf_distance_matrix(r)
    order = [l2.index(x) for x in l1]
    assert np.allclose(d1, d2[np.ix_(order, order)])
    idx = taxon_index(sorted(t.leaf_labels()))
    assert bipartitions(t, idx) == bipartitions(r, idx)


def test_root_by_outgroup():
    t = parse_newick(NWK)
    r = root_by_outgroup(t, ["D", "E"])
    r.validate()
    kids = r.children[r.root]
    assert len(kids) == 2
    sides = [sorted(r.labels[i] for i in r.descendant_leaves(k))
             for k in kids]
    assert ["D", "E"] in sides


def test_root_by_outgroup_compressed_names():
    t = parse_newick("((A_x:1,B:1):1,(C:1,D:1):1);")
    r = root_by_outgroup(t, ["a x.PATRIC.faa"])
    side = [sorted(r.labels[i] for i in r.descendant_leaves(k))
            for k in r.children[r.root]]
    assert ["A_x"] in side


def test_compress_name():
    assert compress_name("Foo_bar Baz.PATRIC.faa") == "foobarbaz"
    assert compress_name("Foo_bar_Baz.PATRIC") == "foobarbaz"
    assert compress_name("Foo bar,baz") == "foobarbaz"


def test_replace_subtree():
    t = parse_newick(NWK)
    # replace the (D,E) clade with (D,(E,F))
    de = None
    for i in range(t.n_nodes):
        if not t.is_leaf(i) and \
                sorted(t.labels[j] for j in t.descendant_leaves(i)) == ["D", "E"]:
            de = i
    sub = parse_newick("(D:0.1,(E:0.1,F:0.1):0.1);")
    r = replace_subtree(t, de, sub)
    r.validate()
    assert sorted(r.leaf_labels()) == ["A", "B", "C", "D", "E", "F"]
    idx = taxon_index(sorted(r.leaf_labels()))
    bips = bipartitions(r, idx)
    ef = (1 << idx["E"]) | (1 << idx["F"])
    assert ef in bips
    ab = (1 << idx["A"]) | (1 << idx["B"])
    full = (1 << 6) - 1
    assert (full & ~ab) in bips or ab in bips


def test_remove_taxa():
    t = parse_newick(NWK)
    r = remove_taxa(t, {"D"})
    r.validate()
    assert sorted(r.leaf_labels()) == ["A", "B", "C", "E"]
    # C-E path length preserved: C:0.3 + 0.2 + E:0.4 = 0.9
    d, labels = leaf_distance_matrix(r)
    assert d[labels.index("C"), labels.index("E")] == pytest.approx(0.9)


def test_rf_distance():
    t1 = parse_newick("((A,B),(C,D));")
    t2 = parse_newick("((A,C),(B,D));")
    assert rf_distance(t1, t1) == 0
    assert rf_distance(t1, t2) == 2


def test_decorate_supports():
    main = parse_newick("((A,B),(C,(D,E)));")
    sup = [parse_newick("((A,B),(C,(D,E)));"),
           parse_newick("((A,B),(D,(C,E)));"),
           parse_newick("(((A,B),C),(D,E));")]
    dec = decorate_supports(main, sup)
    by_clade = {}
    for i in range(dec.n_nodes):
        if not dec.is_leaf(i):
            clade = "".join(sorted(dec.labels[j]
                                   for j in dec.descendant_leaves(i)))
            by_clade[clade] = dec.support[i]
    assert by_clade["AB"] == 3
    assert by_clade["DE"] == 2
    assert by_clade["CDE"] == 3  # same bipartition as AB in unrooted sense


def test_normalize_supports():
    t = parse_newick("((A:1,B:1)0.97:1,(C:1,D:1)1.0:1);")
    n = normalize_supports(t)
    vals = sorted(v for v in n.support if not math.isnan(v))
    assert vals == [97.0, 100.0]


def test_mean_descendant_supports():
    t = parse_newick("(((A,B)80,C)100,(D,E)60);")
    m = mean_descendant_supports(t)
    root = t.root
    vals = m[root]
    assert vals == pytest.approx((80 + 100 + 60) / 3)


def test_nj_recovers_additive_tree():
    t = parse_newick("((A:1,B:2):1,(C:1.5,(D:0.5,E:1):0.7):0.8);")
    d, labels = leaf_distance_matrix(t)
    nj = neighbor_joining(d, labels)
    nj.validate()
    assert rf_distance(nj, t) == 0
    d2, l2 = leaf_distance_matrix(nj)
    order = [l2.index(x) for x in labels]
    assert np.allclose(d, d2[np.ix_(order, order)], atol=1e-9)


def test_nj_larger_random(rng):
    # random additive tree via random binary topology + random lengths
    n = 24
    names = [f"T{i}" for i in range(n)]
    import math as _m
    parents = [-1]
    labels = [None]
    blens = [float("nan")]
    leaves = [0]
    while len(leaves) < n:
        tgt = leaves[rng.integers(len(leaves))]
        a, b = len(parents), len(parents) + 1
        parents += [tgt, tgt]
        labels += [None, None]
        blens += [float(rng.uniform(0.05, 1.0)), float(rng.uniform(0.05, 1.0))]
        leaves.remove(tgt)
        leaves += [a, b]
    for k, leaf in enumerate(leaves):
        labels[leaf] = names[k]
    t = Tree(np.array(parents, dtype=np.int32), labels, np.array(blens),
             np.full(len(parents), _m.nan))
    d, lab = leaf_distance_matrix(t)
    nj = neighbor_joining(d, lab)
    assert rf_distance(nj, t) == 0


def test_select_compatible_subset():
    """BipartitionSet.findCompatibleBipartitionSet role: the greedy
    selection keeps the heavily-supported, mutually compatible
    bipartitions and drops the conflicting minority."""
    from pepr_tpu.tree.bipartition import (bipartition_counts, compatible,
                                           select_compatible, taxon_index)
    from pepr_tpu.tree import parse_newick

    taxa = list("ABCDEF")
    idx = taxon_index(taxa)
    full = (1 << 6) - 1
    main = parse_newick("(((A,B),(C,D)),(E,F));")
    conflict = parse_newick("(((A,C),(B,D)),(E,F));")
    counts = bipartition_counts([main] * 9 + [conflict], idx)
    sel = select_compatible(counts, full)
    # every main-tree bipartition survives; the conflicting minority
    # bipartitions (AC, BD) are dropped
    main_bips = bipartition_counts([main], idx)
    assert set(sel) >= set(main_bips)
    for a in sel:
        for b in sel:
            assert compatible(a, b, full)


def test_bipartitions_as_matrix():
    from pepr_tpu.tree.bipartition import (bipartitions_as_matrix,
                                           taxon_index)
    taxa = list("ABCD")
    # bipartition {A,B} vs {C,D}: canonical excludes taxon 0 -> {C,D}
    bip = (1 << 2) | (1 << 3)
    rows = bipartitions_as_matrix([bip], taxa)
    assert rows == ["0", "0", "1", "1"]
    # partial participation: D not participating -> '?'
    part = (1 << 0) | (1 << 1) | (1 << 2)
    rows = bipartitions_as_matrix([bip], taxa, {bip: part})
    assert rows == ["0", "0", "1", "?"]
