"""Pallas pruning kernel vs the XLA-scan engine (interpret mode on
CPU; on TPU the same kernel compiles via Mosaic)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pepr_tpu.ops.likelihood import WagModel, loglik, tree_to_arrays
from pepr_tpu.ops.pallas_pruning import loglik_pallas
from pepr_tpu.tree import parse_newick
from pepr_tpu.utils.simulate import simulate_alignment


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    tree = parse_newick("(((A:0.1,B:0.2):0.1,(C:0.15,D:0.1):0.2):0.05,"
                        "(E:0.1,F:0.3):0.1,(G:0.2,H:0.1):0.15);")
    codes, taxa = simulate_alignment(tree, 200, rng, alpha=0.8)
    codes[0, 5] = 22  # ambiguity
    codes[3, 17] = 23
    arr = tree_to_arrays(tree, taxa)
    return codes, arr


def test_pallas_matches_scan_engine(problem):
    codes, arr = problem
    model = WagModel.create(alpha=0.9)
    want = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                        jnp.asarray(arr.blen), model))
    got = loglik_pallas(codes, arr.children, arr.blen, model,
                        interpret=True)
    assert got == pytest.approx(want, rel=1e-5)


def test_pallas_site_weights(problem):
    codes, arr = problem
    model = WagModel.create()
    w = np.zeros(codes.shape[1], np.float32)
    w[:73] = 1.0
    got = loglik_pallas(codes, arr.children, arr.blen, model,
                        site_weights=w, interpret=True)
    want = float(loglik(jnp.asarray(codes[:, :73]),
                        jnp.asarray(arr.children),
                        jnp.asarray(arr.blen), model))
    assert got == pytest.approx(want, rel=1e-5)


def test_pallas_nonmultiple_length(problem):
    codes, arr = problem
    model = WagModel.create()
    # L=200 is not a multiple of 128; padding must not change the sum
    got = loglik_pallas(codes, arr.children, arr.blen, model,
                        site_weights=np.ones(200, np.float32),
                        interpret=True)
    want = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                        jnp.asarray(arr.blen), model))
    assert got == pytest.approx(want, rel=1e-5)


def test_loglik_sites_pallas_dispatch_matches(problem):
    """The production dispatch entry (loglik_sites_pallas) matches the
    scan engine in interpret mode, including the einsum-built padded
    transition matrices."""
    from pepr_tpu.ops.likelihood import loglik_sites, loglik_sites_pallas

    codes, arr = problem
    model = WagModel.create(alpha=1.3)
    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    want = np.asarray(loglik_sites(jnp.asarray(codes),
                                   jnp.asarray(arr.children),
                                   jnp.asarray(arr.blen), *margs))
    got = np.asarray(loglik_sites_pallas(jnp.asarray(codes),
                                         jnp.asarray(arr.children),
                                         jnp.asarray(arr.blen), *margs,
                                         interpret=True))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_impl_env_pin(monkeypatch):
    from pepr_tpu.ops import likelihood

    monkeypatch.setenv("PEPR_LIKELIHOOD_IMPL", "pallas")
    assert likelihood.forward_impl() == "pallas"
    monkeypatch.setenv("PEPR_LIKELIHOOD_IMPL", "scan")
    assert likelihood.forward_impl() == "scan"
    monkeypatch.delenv("PEPR_LIKELIHOOD_IMPL")
    assert likelihood.forward_impl() in ("scan", "pallas")
