"""Nucleotide GTR mode (FastTree -gtr -nt role, FastTreeRunner.java:
67-77), AA->codon gap mapping (AlignmentUtilities.java:447-469), and
constraint-tree search (FastTreeRunner.java:243-273)."""

import numpy as np
import pytest

from pepr_tpu.alphabet import (GAP, decode_nt, encode_nt,
                               map_alignment_gaps_to_nt)
from pepr_tpu.models.treebuild import (fasttree_constraint_matrix, ml_tree,
                                       tree_to_arrays)
from pepr_tpu.ops.likelihood import WagModel, loglik, loglik_numpy_eig
from pepr_tpu.tree import parse_newick
from pepr_tpu.tree.bipartition import bipartitions, taxon_index


def test_nt_encode_roundtrip():
    codes = encode_nt("ACGTacgu-N?")
    assert list(codes[:4]) == [0, 1, 2, 3]
    assert list(codes[4:8]) == [0, 1, 2, 3]
    assert codes[8] == GAP
    assert codes[9] >= 20  # ambiguity
    assert decode_nt(codes[:9]) == "ACGTACGT-"


def test_map_alignment_gaps_to_nt():
    aa = "M-KV-"
    nt = "ATGAAAGTT"  # M K V codons
    assert map_alignment_gaps_to_nt(aa, nt) == "ATG---AAAGTT---"


def _sim_nt(tree, L, rng, model):
    """Evolve nucleotide sites down the tree under the padded GTR."""
    eig = model.eig.astype(np.float64)
    u = model.u.astype(np.float64)
    ui = model.u_inv.astype(np.float64)
    pi = model.pi.astype(np.float64)
    taxa = sorted(tree.labels[i] for i in range(tree.n_nodes)
                  if tree.is_leaf(i))
    # simulate with a single rate (alpha handled by the model's cats)
    root_states = rng.choice(20, size=L, p=pi / pi.sum())
    states = {tree.root: root_states}
    rows = {}
    for node in tree.preorder():
        if node == tree.root:
            continue
        t = max(float(tree.blen[node]), 1e-6)
        p = u @ np.diag(np.exp(eig * t)) @ ui
        p = np.maximum(p, 0)
        p /= p.sum(axis=1, keepdims=True)
        parent_states = states[tree.parent[node]]
        cur = np.array([rng.choice(20, p=p[s]) for s in parent_states])
        states[node] = cur
        if tree.is_leaf(node):
            rows[tree.labels[node]] = cur
    return np.stack([rows[t] for t in taxa]).astype(np.int8), taxa


def test_gtr_nt_model_likelihood_and_recovery():
    rng = np.random.default_rng(13)
    model = WagModel.gtr_nt(freqs=[0.3, 0.2, 0.2, 0.3],
                            rates=[1, 4, 1, 1, 4, 1])  # transition bias
    tree = parse_newick(
        "(((A:0.2,B:0.25):0.15,(C:0.2,D:0.25):0.15):0.1,"
        "(E:0.2,F:0.25):0.1);")
    codes, taxa = _sim_nt(tree, 600, rng, model)
    assert codes.max() < 4  # only live states generated
    arr = tree_to_arrays(tree, taxa)
    got = float(loglik(codes, arr.children, arr.blen, model))
    want = loglik_numpy_eig(codes, arr.children, arr.blen, model)
    assert got == pytest.approx(want, rel=1e-4)
    # the engine recovers the generating topology from NT data
    est, _ = ml_tree(codes, taxa, model, nni_rounds=6, spr_rounds=1)
    idx = taxon_index(taxa)
    assert set(bipartitions(est, idx)) == set(bipartitions(tree, idx))


def test_constraint_tree_respected():
    """A constraint incompatible with the data's best tree keeps the
    search inside the constraint's bipartitions."""
    from pepr_tpu.utils.simulate import simulate_alignment

    rng = np.random.default_rng(17)
    true = parse_newick(
        "(((A:0.15,B:0.12):0.1,(C:0.1,D:0.14):0.12):0.06,"
        "(E:0.12,F:0.1):0.06);")
    codes, taxa = simulate_alignment(true, 400, rng)
    # constraint forces (A,C) together — conflicts with the signal
    constraint = parse_newick("((A,C),(B,D),(E,F));")
    est, _ = ml_tree(codes, taxa, WagModel.create(),
                     start=constraint, constraint=constraint,
                     nni_rounds=6, spr_rounds=1)
    idx = taxon_index(taxa)
    full = (1 << len(taxa)) - 1
    from pepr_tpu.tree.bipartition import compatible
    cons_bips = set(bipartitions(constraint, idx))
    for b in bipartitions(est, idx):
        for c in cons_bips:
            assert compatible(b, c, full)


def test_fasttree_constraint_matrix_format():
    tree = parse_newick("((A,B),(C,D));")
    txt = fasttree_constraint_matrix(tree, ["A", "B", "C", "D"])
    lines = txt.strip().splitlines()
    assert lines[0] == ">A"
    assert len(lines) == 8
    width = len(lines[1])
    assert all(len(lines[i]) == width for i in range(1, 8, 2))
    assert set("".join(lines[1::2])) <= {"0", "1"}
