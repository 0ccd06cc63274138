"""Tests for the deepened ML search: full NNI neighborhood, multi-move
acceptance, and the batched SPR sweep (the search-depth role of
RAxMLRunner.java:115-129)."""

import numpy as np
import pytest

from pepr_tpu.models.treebuild import (_apply_swaps, _nni_moves,
                                       _postorder_fix, _spr_candidates,
                                       ml_tree, nj_start_tree,
                                       tree_to_arrays)
from pepr_tpu.ops.likelihood import WagModel, loglik
from pepr_tpu.tree import parse_newick, to_newick
from pepr_tpu.tree.bipartition import bipartitions, taxon_index
from pepr_tpu.utils.simulate import simulate_alignment


def tree_bipartitions(tree, taxa):
    return set(bipartitions(tree, taxon_index(taxa)))


def _leafsets(children, n_leaves):
    n_int = children.shape[0]
    sets = {}
    for k in range(n_int):
        s = set()
        for c in children[k]:
            if c < 0:
                continue
            s |= sets[int(c)] if c >= n_leaves else {int(c)}
        sets[n_leaves + k] = s
    return sets


def _valid_tree(children, n_leaves):
    """Every internal node has 2-3 kids, every node except root has
    exactly one parent, root subtends all leaves."""
    n_int = children.shape[0]
    seen = []
    for k in range(n_int):
        kids = [int(c) for c in children[k] if c >= 0]
        assert 2 <= len(kids) <= 3
        seen.extend(kids)
    assert sorted(seen) == sorted(set(seen))  # single parent each
    assert len(seen) == n_leaves + n_int - 1  # all but root
    sets = _leafsets(children, n_leaves)
    assert sets[n_leaves + n_int - 1] == set(range(n_leaves))


@pytest.fixture(scope="module")
def eight_taxa():
    rng = np.random.default_rng(7)
    true = parse_newick(
        "(((A:0.12,B:0.1):0.08,(C:0.1,D:0.12):0.09):0.05,"
        "((E:0.1,F:0.12):0.1,(G:0.12,H:0.1):0.08):0.05);")
    codes, taxa = simulate_alignment(true, 600, rng)
    return true, codes, taxa


def test_nni_moves_cover_root_trifurcation():
    t = parse_newick("((A,B),(C,D),(E,F));")
    taxa = ["A", "B", "C", "D", "E", "F"]
    arr = tree_to_arrays(t, taxa)
    moves = _nni_moves(arr.children, 6)
    # every internal edge gets 2 swap partners at the root (2 siblings)
    # and the swaps produce valid trees
    assert len(moves) >= 6
    for m in moves:
        cand = _postorder_fix(_apply_swaps(arr.children, 6, [m]), 6)
        _valid_tree(cand, 6)


def test_spr_candidates_are_valid_and_nontrivial(eight_taxa):
    true, codes, taxa = eight_taxa
    arr = tree_to_arrays(true, taxa)
    cands = _spr_candidates(arr.children, len(taxa))
    assert len(cands) > 20  # prune x regraft grid, not a token few
    orig = _leafsets(arr.children, len(taxa))
    n_diff = 0
    for c in cands:
        fixed = _postorder_fix(c, len(taxa))
        _valid_tree(fixed, len(taxa))
        if _leafsets(fixed, len(taxa)).values() != orig.values():
            n_diff += 1
    # SPR moves change the topology (not all no-ops)
    assert n_diff > 0


def test_ml_tree_recovers_topology_via_spr(eight_taxa):
    """Start from a scrambled topology far enough that plain NNI from
    it needs several moves; the search (multi-move NNI + SPR) must
    recover the true tree's bipartitions."""
    true, codes, taxa = eight_taxa
    # deliberately bad start: ladder mixing the clades
    bad = parse_newick(
        "(((((((A:0.1,E:0.1):0.1,C:0.1):0.1,G:0.1):0.1,B:0.1):0.1,"
        "F:0.1):0.1,D:0.1):0.1,H:0.1);")
    model = WagModel.create()
    tree, ll = ml_tree(codes, taxa, model, start=bad, nni_rounds=12,
                       spr_rounds=3)
    want = tree_bipartitions(true, taxa)
    got = tree_bipartitions(tree, taxa)
    assert set(want) == set(got), (to_newick(tree))
    # final LL beats the bad start's optimized LL
    bad_arr = tree_to_arrays(bad, taxa)
    ll_bad = float(loglik(codes, bad_arr.children, bad_arr.blen, model))
    assert ll > ll_bad
