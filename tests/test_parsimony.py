import numpy as np
import pytest
import jax.numpy as jnp

from pepr_tpu.models.treebuild import parsimony_tree
from pepr_tpu.ops.likelihood import tree_to_arrays
from pepr_tpu.ops.parsimony import (fitch_numpy, fitch_score, fitch_sites)
from pepr_tpu.tree import parse_newick, rf_distance
from pepr_tpu.utils.simulate import simulate_alignment

NWK = "((A:0.1,B:0.1):0.1,((C:0.1,D:0.1):0.1,E:0.1):0.1,F:0.1);"


def test_fitch_matches_oracle(rng):
    tree = parse_newick(NWK)
    taxa = sorted(tree.leaf_labels())
    arr = tree_to_arrays(tree, taxa)
    codes = rng.integers(0, 20, size=(6, 50)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.05] = 22  # X
    got = fitch_score(codes, arr.children)
    want = fitch_numpy(codes, arr.children)
    assert got == want


def test_fitch_invariant_column_zero():
    tree = parse_newick(NWK)
    taxa = sorted(tree.leaf_labels())
    arr = tree_to_arrays(tree, taxa)
    codes = np.zeros((6, 10), dtype=np.int8)  # all same residue
    assert fitch_score(codes, arr.children) == 0
    codes[0, :] = 1  # one taxon differs -> 1 step per column
    assert fitch_score(codes, arr.children) == 10


def test_parsimony_tree_recovers_topology():
    rng = np.random.default_rng(5)
    true = parse_newick("((A:0.1,B:0.12):0.08,((C:0.1,D:0.1):0.09,"
                        "(E:0.1,F:0.1):0.08):0.07,G:0.2);")
    codes, taxa = simulate_alignment(true, 500, rng)
    tree, score = parsimony_tree(codes, taxa, nni_rounds=4)
    assert rf_distance(tree, true) == 0
    assert score > 0


def test_parsimony_bl_sets_branch_lengths():
    rng = np.random.default_rng(6)
    true = parse_newick("((A:0.1,B:0.12):0.08,(C:0.1,D:0.1):0.09,E:0.2);")
    codes, taxa = simulate_alignment(true, 300, rng)
    tree, _ = parsimony_tree(codes, taxa, branch_lengths=True,
                             nni_rounds=2, bl_steps=60)
    bl = [b for b in tree.blen if np.isfinite(b)]
    assert len(bl) > 0 and all(b >= 0 for b in bl)
    assert np.std(bl) > 0  # actually fitted, not defaults
