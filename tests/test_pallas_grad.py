"""Backward Pallas pruning kernel vs autodiff of a pure-jnp reference
(interpret mode on CPU; the TPU smoke lane compiles the same kernel
on the real chip)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pepr_tpu.ops.pallas_pruning import (A_PAD, CA, N_CATS, S_TILE,
                                         block_diag_pmats)
from pepr_tpu.ops.pallas_pruning_grad import pruning_grad_pmats_pallas


def _ref_weighted_ll(codes, children, pmats_bd, pi_vec, ct):
    """sum_s ct_s * ll_s computed with plain jnp from the block-diag
    transition matrices (differentiable)."""
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    C = N_CATS
    pm = jnp.stack([pmats_bd[:, c * A_PAD:c * A_PAD + 20,
                             c * A_PAD:c * A_PAD + 20]
                    for c in range(C)])  # (C, V, 20, 20)
    live = (pi_vec[:20] > 1e-6).astype(jnp.float32)
    onehot = jax.nn.one_hot(codes, 20, dtype=jnp.float32)
    tips = jnp.where((codes >= 20)[..., None], live[None, None, :],
                     onehot)  # (n_leaves, L, 20)
    parts = [tips[i][None].repeat(C, axis=0) for i in range(n_leaves)]
    logscale = jnp.zeros((C, L))
    for i in range(n_int):
        prod = jnp.ones((C, L, 20))
        for cid in children[i]:
            cid = int(cid)
            if cid < 0:
                continue
            term = jnp.einsum("cab,clb->cla", pm[:, cid], parts[cid])
            prod = prod * term
        m = jnp.maximum(prod.max(axis=-1), 1e-30)
        parts.append(prod / m[..., None])
        logscale = logscale + jnp.log(m)
    root = parts[-1]
    site_cat = jnp.log(jnp.maximum(
        jnp.einsum("a,cla->cl", pi_vec[:20], root), 1e-30)) + logscale
    ll = jax.scipy.special.logsumexp(site_cat, axis=0) - jnp.log(1.0 * C)
    return (ll * ct).sum()


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    from pepr_tpu.ops.likelihood import (WagModel, transition_matrices,
                                         tree_to_arrays)
    from pepr_tpu.tree import parse_newick
    from pepr_tpu.utils.simulate import simulate_alignment

    nwk = "(((A:0.12,B:0.3):0.15,(C:0.1,D:0.25):0.2):0.1," \
          "(E:0.4,F:0.08):0.18);"
    tree = parse_newick(nwk)
    codes, taxa = simulate_alignment(tree, S_TILE, rng)
    arr = tree_to_arrays(tree, taxa)
    model = WagModel.create(alpha=0.8)
    pm = transition_matrices(model, jnp.asarray(arr.blen))
    pmats_bd = block_diag_pmats(pm)
    pi = np.zeros((1, A_PAD), np.float32)
    pi[0, :20] = model.pi
    return codes, arr, pmats_bd, pi


def test_grad_pmats_matches_autodiff(problem):
    codes, arr, pmats_bd, pi = problem
    rng = np.random.default_rng(3)
    ct = rng.random(codes.shape[1]).astype(np.float32)

    want = jax.grad(
        lambda p: _ref_weighted_ll(jnp.asarray(codes),
                                   arr.children, p,
                                   jnp.asarray(pi[0]),
                                   jnp.asarray(ct)))(pmats_bd)
    got = pruning_grad_pmats_pallas(
        jnp.asarray(codes), jnp.asarray(arr.children, jnp.int32),
        pmats_bd, jnp.asarray(pi), jnp.asarray(ct), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-5)


def test_grad_pmats_multi_tile(problem):
    """Accumulation across multiple site tiles."""
    codes, arr, pmats_bd, pi = problem
    codes2 = np.concatenate([codes, codes[:, ::-1]], axis=1)
    ct = np.linspace(0.2, 1.0, codes2.shape[1]).astype(np.float32)
    want = jax.grad(
        lambda p: _ref_weighted_ll(jnp.asarray(codes2),
                                   arr.children, p,
                                   jnp.asarray(pi[0]),
                                   jnp.asarray(ct)))(pmats_bd)
    got = pruning_grad_pmats_pallas(
        jnp.asarray(codes2), jnp.asarray(arr.children, jnp.int32),
        pmats_bd, jnp.asarray(pi), jnp.asarray(ct), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-5)


def test_blen_grads_through_pallas_forward(problem):
    """End-to-end branch-length gradients: Pallas forward + backward
    (custom VJP) must match the XLA scan's autodiff."""
    from pepr_tpu.ops.likelihood import (WagModel, loglik_sites,
                                         loglik_sites_pallas)
    codes, arr, _, _ = problem
    model = WagModel.create(alpha=0.8)
    rng = np.random.default_rng(5)
    w = rng.random(codes.shape[1]).astype(np.float32)
    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    cd = jnp.asarray(codes)
    ch = jnp.asarray(arr.children)
    bl = jnp.asarray(arr.blen)
    wd = jnp.asarray(w)

    def f_pallas(blen):
        return (loglik_sites_pallas(cd, ch, blen, *margs,
                                    interpret=True) * wd).sum()

    def f_scan(blen):
        return (loglik_sites(cd, ch, blen, *margs) * wd).sum()

    v1, g1 = jax.value_and_grad(f_pallas)(bl)
    v2, g2 = jax.value_and_grad(f_scan)(bl)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=2e-4)
