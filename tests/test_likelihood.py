import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pepr_tpu.ops.gamma import discrete_gamma_rates
from pepr_tpu.ops.likelihood import (WagModel, arrays_to_tree, loglik,
                                     loglik_numpy_eig, tree_to_arrays)
from pepr_tpu.tree import parse_newick, rf_distance


def _random_codes(rng, n, L, ambig=0.05):
    codes = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    mask = rng.random((n, L)) < ambig
    codes[mask] = 22  # X
    return codes


def test_discrete_gamma_rates():
    r = discrete_gamma_rates(1.0, 4)
    assert r.shape == (4,)
    assert np.all(np.diff(r) > 0)
    assert r.mean() == pytest.approx(1.0, abs=1e-9)
    # alpha -> infinity: all rates -> 1
    r_inf = discrete_gamma_rates(200.0, 4)
    assert np.allclose(r_inf, 1.0, atol=0.15)
    # known Yang(1994)-style values for alpha=0.5
    r_half = discrete_gamma_rates(0.5, 4)
    assert r_half[0] < 0.05 and r_half[3] > 2.0


def test_loglik_matches_numpy_oracle(rng):
    model = WagModel.create(alpha=1.0)
    nwk = "((A:0.1,B:0.25):0.15,(C:0.3,D:0.05):0.2,E:0.4);"
    tree = parse_newick(nwk)
    taxa = sorted(tree.leaf_labels())
    arr = tree_to_arrays(tree, taxa)
    codes = _random_codes(rng, 5, 40)
    got = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                       jnp.asarray(arr.blen), model))
    want = loglik_numpy_eig(codes, arr.children, arr.blen, model)
    assert got == pytest.approx(want, rel=1e-4)


def test_loglik_rooting_invariance(rng):
    """Pruning LL must not depend on root placement (reversibility)."""
    from pepr_tpu.tree import reroot_on_edge, unroot
    model = WagModel.create(alpha=0.7)
    tree = parse_newick("((A:0.1,B:0.25):0.15,(C:0.3,D:0.05):0.2,E:0.4);")
    taxa = sorted(tree.leaf_labels())
    codes = _random_codes(rng, 5, 30)

    def ll(t):
        arr = tree_to_arrays(t, taxa)
        return float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                            jnp.asarray(arr.blen), model))

    base = ll(tree)
    u = unroot(tree)
    leaf_c = [i for i in u.leaves() if u.labels[i] == "C"][0]
    r = reroot_on_edge(u, leaf_c, 0.3)
    assert ll(r) == pytest.approx(base, rel=1e-5)


def test_loglik_site_weights(rng):
    model = WagModel.create()
    tree = parse_newick("((A:0.1,B:0.2):0.1,(C:0.1,D:0.2):0.1);")
    taxa = sorted(tree.leaf_labels())
    arr = tree_to_arrays(tree, taxa)
    codes = _random_codes(rng, 4, 20)
    w = np.zeros(20, np.float32)
    w[:10] = 1.0
    full = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                        jnp.asarray(arr.blen), model,
                        site_weights=jnp.asarray(w)))
    half = float(loglik(jnp.asarray(codes[:, :10]),
                        jnp.asarray(arr.children), jnp.asarray(arr.blen),
                        model))
    assert full == pytest.approx(half, rel=1e-5)


def test_loglik_chunking(rng):
    model = WagModel.create()
    tree = parse_newick("((A:0.1,B:0.2):0.1,(C:0.1,D:0.2):0.1);")
    arr = tree_to_arrays(tree, sorted(tree.leaf_labels()))
    codes = _random_codes(rng, 4, 100)
    a = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                     jnp.asarray(arr.blen), model, chunk=100))
    b = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                     jnp.asarray(arr.blen), model, chunk=17))
    assert a == pytest.approx(b, rel=1e-5)


def test_loglik_gradient(rng):
    model = WagModel.create()
    tree = parse_newick("((A:0.1,B:0.2):0.1,(C:0.1,D:0.2):0.1);")
    arr = tree_to_arrays(tree, sorted(tree.leaf_labels()))
    codes = jnp.asarray(_random_codes(rng, 4, 30))
    children = jnp.asarray(arr.children)

    def f(b):
        return loglik(codes, children, b, model)

    g = jax.grad(f)(jnp.asarray(arr.blen))
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one branch
    eps = 1e-3
    b0 = jnp.asarray(arr.blen)
    fd = (float(f(b0.at[0].add(eps))) - float(f(b0.at[0].add(-eps)))) / (2 * eps)
    assert float(g[0]) == pytest.approx(fd, rel=5e-2, abs=1e-3)


def test_tree_arrays_roundtrip():
    tree = parse_newick("((A:0.1,B:0.25)90:0.15,(C:0.3,D:0.05)80:0.2,E:0.4);")
    taxa = sorted(tree.leaf_labels())
    arr = tree_to_arrays(tree, taxa)
    back = arrays_to_tree(arr)
    assert rf_distance(back, tree) == 0
    assert sorted(back.leaf_labels()) == taxa


def test_identical_sequences_prefer_short_branches(rng):
    """LL should increase as branch lengths shrink when all sequences
    are identical."""
    model = WagModel.create()
    tree_s = parse_newick("((A:0.01,B:0.01):0.01,(C:0.01,D:0.01):0.01);")
    tree_l = parse_newick("((A:0.5,B:0.5):0.5,(C:0.5,D:0.5):0.5);")
    taxa = sorted(tree_s.leaf_labels())
    row = rng.integers(0, 20, size=30).astype(np.int8)
    codes = np.tile(row, (4, 1))
    lls = []
    for t in (tree_s, tree_l):
        arr = tree_to_arrays(t, taxa)
        lls.append(float(loglik(jnp.asarray(codes),
                                jnp.asarray(arr.children),
                                jnp.asarray(arr.blen), model)))
    assert lls[0] > lls[1]
