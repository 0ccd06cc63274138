import numpy as np
import pytest

from pepr_tpu.models.concat import concatenate
from pepr_tpu.models.msa import Alignment
from pepr_tpu.models.support import (bootstrap_weights, jackknife_mask,
                                     support_tree_single)
from pepr_tpu.models.treebuild import estimate_gamma_alpha
from pepr_tpu.pipeline.stage1 import filter_duplicate_species
from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.tree import parse_newick, rf_distance
from pepr_tpu.utils.simulate import simulate_alignment


def _cat(rng, n_genes=6, L=50):
    tree = parse_newick("((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1);")
    genes = []
    for g in range(n_genes):
        codes, taxa = simulate_alignment(tree, L, rng)
        genes.append(Alignment(f"g{g}", taxa, codes))
    return tree, concatenate(genes)


def test_bootstrap_weights_properties():
    w = bootstrap_weights(100, 0, 42)
    assert w.shape == (100,)
    assert w.sum() == 100
    w2 = bootstrap_weights(100, 0, 42)
    assert (w == w2).all()  # deterministic per (seed, rep)
    w3 = bootstrap_weights(100, 1, 42)
    assert not (w == w3).all()


def test_jackknife_mask_deterministic(rng):
    _, cat = _cat(rng)
    m1 = jackknife_mask(cat, 3, 9)
    m2 = jackknife_mask(cat, 3, 9)
    assert (m1 == m2).all()
    # covers about half the genes' columns
    assert 0.3 < m1.mean() < 0.7


def test_bootstrap_support_tree(rng):
    tree, cat = _cat(rng, n_genes=8, L=80)
    t = support_tree_single(cat, 0, 5, resample="bootstrap_sites",
                            nni_rounds=2, bl_steps=40)
    assert rf_distance(t, tree) == 0


def test_estimate_gamma_alpha_recovers_high_alpha(rng):
    # rate-homogeneous data -> alpha estimate should be large
    tree = parse_newick("((A:0.2,B:0.2):0.1,(C:0.2,D:0.2):0.1);")
    codes, taxa = simulate_alignment(tree, 400, rng, alpha=None)
    a_hom = estimate_gamma_alpha(codes, taxa, tree, refine_iters=1)
    # strongly heterogeneous data -> small alpha
    codes2, taxa2 = simulate_alignment(tree, 400, rng, alpha=0.3)
    a_het = estimate_gamma_alpha(codes2, taxa2, tree, refine_iters=1)
    assert a_hom > a_het
    assert a_het < 1.5


def test_filter_duplicate_species_keeps_larger():
    g1 = SequenceSet("a", ["x [Copro sp A]"] * 2,
                     [np.zeros(5, np.int8)] * 2)
    g2 = SequenceSet("b", ["x [Copro sp B]"] * 3,
                     [np.zeros(5, np.int8)] * 3)
    g3 = SequenceSet("c", ["x [Other thing C]"],
                     [np.zeros(5, np.int8)])
    kept = filter_duplicate_species([g1, g2, g3])
    assert len(kept) == 2
    assert kept[0].taxon == "Copro_sp_B"  # larger genome wins


def test_nni_round_cap_with_replicates_still_moving(rng, tmp_path, caplog):
    """Drive support_trees_batched into the NNI round cap while
    replicates are still moving — r4's production crash (NameError in
    the cap warning, support.py:337) lived exactly on this path."""
    import logging

    from pepr_tpu.models.support import support_trees_batched
    from pepr_tpu.pipeline.checkpoint import CheckpointStore
    from pepr_tpu.tree import to_newick

    tree = parse_newick(
        "(((A:0.1,B:0.1):0.2,(C:0.1,D:0.1):0.2):0.1,"
        "(E:0.1,F:0.1):0.2);")
    genes = []
    for g in range(6):
        codes, taxa = simulate_alignment(tree, 60, rng)
        genes.append(Alignment(f"g{g}", taxa, codes))
    cat = concatenate(genes)
    # pre-seed deliberately WRONG starting topologies so round 0 is
    # guaranteed to find improving NNI moves for every replicate
    bad = ("((A:0.1,F:0.1):0.1,(B:0.1,E:0.1):0.1,"
           "(C:0.1,D:0.1):0.1);")
    store = CheckpointStore(str(tmp_path / "cap_ckpt"))
    store.save("support_starts", [bad, bad])
    with caplog.at_level(logging.WARNING, logger="pepr_tpu"):
        trees = support_trees_batched(cat, 2, seed=7, bl_steps=15,
                                      store=store, max_rounds=1)
    assert len(trees) == 2
    for t in trees:
        assert to_newick(t)  # well-formed output despite the cap
    assert any("round cap" in r.message for r in caplog.records)
