import numpy as np
import pytest

from pepr_tpu.models.treebuild import (ml_tree, nj_tree,
                                       optimize_branch_lengths,
                                       protein_distances, _nni_candidates,
                                       _postorder_fix)
from pepr_tpu.ops.likelihood import WagModel, tree_to_arrays
from pepr_tpu.tree import parse_newick, rf_distance
from pepr_tpu.utils.simulate import simulate_alignment

TRUE_NWK = ("((A:0.12,B:0.08):0.1,((C:0.1,D:0.15):0.08,"
            "(E:0.1,F:0.12):0.1):0.07,G:0.25);")


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(42)
    tree = parse_newick(TRUE_NWK)
    codes, taxa = simulate_alignment(tree, 600, rng, alpha=None)
    return tree, codes, taxa


def test_protein_distances_monotone(sim):
    tree, codes, taxa = sim
    d = protein_distances(codes)
    # closest pair should be one of the true cherries
    iu = np.triu_indices(len(taxa), 1)
    i, j = iu[0][np.argmin(d[iu])], iu[1][np.argmin(d[iu])]
    pair = {taxa[i], taxa[j]}
    assert pair in ({"A", "B"}, {"C", "D"}, {"E", "F"})


def test_nj_recovers_topology(sim):
    tree, codes, taxa = sim
    nj = nj_tree(codes, taxa)
    assert rf_distance(nj, tree) == 0


def test_branch_length_optimization_improves_ll(sim):
    tree, codes, taxa = sim
    model = WagModel.create()
    from pepr_tpu.ops.likelihood import loglik
    import jax.numpy as jnp
    arr = tree_to_arrays(tree, taxa)
    arr.blen[:] = 0.3  # deliberately wrong lengths
    ll0 = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                       jnp.asarray(arr.blen), model))
    blen, ll1 = optimize_branch_lengths(codes, arr, model, steps=150)
    assert ll1 > ll0 + 10
    assert (blen > 0).all()


def test_nni_candidates_shapes():
    tree = parse_newick(TRUE_NWK)
    taxa = sorted(tree.leaf_labels())
    arr = tree_to_arrays(tree, taxa)
    cands = _nni_candidates(arr.children, len(taxa))
    assert len(cands) > 0
    for c in cands:
        assert c.shape == arr.children.shape
        fixed = _postorder_fix(c, len(taxa))
        # postorder invariant: every child id < its parent's id
        for k in range(fixed.shape[0]):
            for kid in fixed[k]:
                if kid >= len(taxa):
                    assert kid < len(taxa) + k + 1


def test_ml_tree_recovers_topology(sim):
    tree, codes, taxa = sim
    got, ll = ml_tree(codes, taxa, nni_rounds=4, bl_steps=80,
                      bl_refine_steps=40)
    assert rf_distance(got, tree) == 0
    assert np.isfinite(ll)


def test_ml_tree_fixes_bad_start(sim):
    tree, codes, taxa = sim
    # deliberately scrambled starting topology
    bad = parse_newick("((A:0.1,C:0.1):0.1,((B:0.1,E:0.1):0.1,"
                       "(D:0.1,F:0.1):0.1):0.1,G:0.1);")
    assert rf_distance(bad, tree) > 0
    got, ll = ml_tree(codes, taxa, start=bad, nni_rounds=8, bl_steps=80,
                      bl_refine_steps=40)
    assert rf_distance(got, tree) < rf_distance(bad, tree)
