"""Matrix-evaluation path (PhylogenomicPipeline2.java:252-295,
1390-1451): model registry sanity + best-model selection on data
simulated under a known model."""

import numpy as np
import pytest

from pepr_tpu.data.protein_models import (eigensystem, model_names,
                                          resolve_model)
from pepr_tpu.models.treebuild import (empirical_aa_freqs,
                                       evaluate_substitution_models)
from pepr_tpu.ops.likelihood import WagModel, loglik, tree_to_arrays
from pepr_tpu.tree import parse_newick
from pepr_tpu.utils.simulate import simulate_alignment


def test_registry_models_are_valid_rate_matrices():
    for name in model_names(include_f=False):
        rates, pi = resolve_model(name)
        assert rates.shape == (20, 20)
        assert np.allclose(rates, rates.T)
        assert (rates[~np.eye(20, dtype=bool)] > 0).all()
        assert pi.shape == (20,) and pi.sum() == pytest.approx(1.0)
        eig, u, ui = eigensystem(rates, pi)
        # valid decomposition: Q reconstructed, rows sum to zero,
        # normalized to 1 expected substitution
        q = (u * eig[None, :]) @ ui
        assert np.allclose(q.sum(axis=1), 0.0, atol=1e-10)
        assert -(pi * np.diag(q)).sum() == pytest.approx(1.0, rel=1e-8)


def test_f_variant_uses_empirical_freqs():
    emp = np.linspace(1, 3, 20)
    emp = emp / emp.sum()
    rates, pi = resolve_model("WAGF", empirical_freqs=emp)
    assert np.allclose(pi, emp)
    with pytest.raises(ValueError):
        resolve_model("WAGF")
    with pytest.raises(KeyError):
        resolve_model("NOPE")


def test_blosum62_freqs_plausible():
    _, pi = resolve_model("BLOSUM62")
    # implied frequencies resemble natural AA composition: L,A,G,S high;
    # W,C low
    assert pi.min() > 0.005 and pi.max() < 0.12
    order = "ARNDCQEGHILKMFPSTWYV"
    assert pi[order.index("L")] > pi[order.index("W")]
    assert pi[order.index("A")] > pi[order.index("C")]


def test_matrix_evaluation_prefers_generating_model():
    rng = np.random.default_rng(21)
    tree = parse_newick(
        "(((A:0.2,B:0.18):0.12,(C:0.15,D:0.2):0.1):0.06,"
        "((E:0.18,F:0.15):0.12,(G:0.15,H:0.2):0.1):0.06);")
    codes, taxa = simulate_alignment(tree, 400, rng)  # WAG-generated
    best, scores = evaluate_substitution_models(
        codes, taxa, ["WAG", "BLOSUM62"], bl_steps=80)
    assert best == "WAG"
    assert scores["WAG"] > scores["BLOSUM62"]
