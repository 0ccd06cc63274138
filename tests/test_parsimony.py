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


def test_parsimony_randomization_thresholds(rng):
    """ConcatenatedSequenceAlignment.java:141-425 machinery: per-gene
    null thresholds from randomized column draws."""
    import jax.numpy as jnp

    from pepr_tpu.models.concat import (ConcatenatedAlignment,
                                        minimum_steps_per_site,
                                        steps_beyond_minimum_per_site,
                                        steps_per_site,
                                        threshold_steps_for_gene)
    from pepr_tpu.models.msa import Alignment
    from pepr_tpu.models.concat import concatenate
    from pepr_tpu.ops.likelihood import tree_to_arrays
    from pepr_tpu.tree import parse_newick

    taxa = list("ABCDEF")
    genes = []
    for g in range(4):
        mat = rng.integers(0, 20, size=(6, 30)).astype(np.int8)
        genes.append(Alignment(f"g{g}", list(taxa), mat))
    cat = concatenate(genes)
    tree = parse_newick("(((A:1,B:1):1,(C:1,D:1):1):1,(E:1,F:1):1);")
    arr = tree_to_arrays(tree, cat.taxa)

    mins = minimum_steps_per_site(cat.mat)
    steps = steps_per_site(cat, arr.children)
    beyond = steps_beyond_minimum_per_site(cat, arr.children)
    assert (steps >= mins).all()  # Fitch is exact >= lower bound
    assert (beyond == steps - mins).all()
    assert mins.max() <= 5  # 6 taxa -> at most 6 states - 1

    thr = threshold_steps_for_gene(cat, steps, 0, reps=50, alpha=0.05,
                                   seed=1)
    # threshold must be in the plausible range of 30-column sums
    assert 30 * steps.min() <= thr <= 30 * steps.max()
    # masked variant: exclude all other genes -> pool too small -> -1
    mask = np.array([False, True, True, True])
    assert threshold_steps_for_gene(cat, steps, 0, reps=10,
                                    gene_mask=mask) == -1
    # masked variant with enough pool works (self-exclusion leaves
    # exactly 3x the gene length)
    mask2 = np.array([False, False, False, False])
    thr2 = threshold_steps_for_gene(cat, steps, 0, reps=50,
                                    gene_mask=mask2, seed=2)
    assert thr2 > 0
