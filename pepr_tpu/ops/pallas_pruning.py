"""Pallas TPU kernel for Felsenstein pruning site log-likelihoods.

The XLA-scan engine (ops/likelihood.py) streams the (n_nodes, C, L, 20)
partials buffer through HBM on every node step.  This kernel tiles the
site axis instead: each grid program holds ALL node partials for a
block of sites in VMEM (n_nodes x C x 20 x S_tile floats), walks the
whole tree for that block, and writes the per-site log-likelihood —
the speed-of-light layout for this computation (partials never leave
VMEM between nodes).

Layout notes (see the TPU tiling constraints): sites ride the 128-wide
lane dimension; the 20 amino-acid states sit in sublanes padded to 24
(f32 sublane multiple of 8); per-child updates are (20x20) @ (20xS)
MXU contractions batched over the category axis.

Numerical semantics are identical to loglik_sites (same per-node
max-rescaling), verified in interpret mode by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pepr_tpu.alphabet import N_AA

S_TILE = 128
A_PAD = 24  # states padded to a sublane multiple


def _kernel(children_ref, codes_ref, pmats_ref, pi_ref, out_ref,
            partials, logscale):
    """One site tile.

    children_ref: (n_int, 3) int32 in SMEM (scalar-prefetched)
    codes_ref: (n_leaves, S) int8 tile in VMEM
    pmats_ref: (C, V, A_PAD, A_PAD) f32 in VMEM (transition matrices,
               row a = parent state, padded region zero)
    pi_ref: (1, A_PAD) f32
    out_ref: (1, S) f32 per-site log-likelihood
    partials: VMEM scratch (V, C, A_PAD, S)
    logscale: VMEM scratch (C, S)
    """
    n_int = children_ref.shape[0]
    n_leaves = codes_ref.shape[0]
    C = pmats_ref.shape[0]
    S = codes_ref.shape[1]

    # tip partials: one-hot over states (ambiguous codes -> all ones
    # over the LIVE states pi > 1e-6, so smaller alphabets riding the
    # 20-lane engine keep dead states exactly zero)
    state_iota = jax.lax.broadcasted_iota(jnp.int32, (A_PAD, S), 0)
    live = (pi_ref[0, :] > 1e-6).astype(jnp.float32)  # (A_PAD,)
    for leaf in range(n_leaves):
        codes = codes_ref[leaf, :].astype(jnp.int32)  # (S,)
        onehot = (state_iota == codes[None, :]).astype(jnp.float32)
        ambig = (codes >= N_AA)[None, :]
        tip = jnp.where(ambig, live[:, None], onehot)
        for c in range(C):
            partials[leaf, c] = tip

    logscale[...] = jnp.zeros((C, S), jnp.float32)

    def node_step(i, _):
        node = n_leaves + i
        prod = jnp.ones((C, A_PAD, S), jnp.float32)
        for k in range(3):
            cid = children_ref[i, k]

            def apply_child(prod):
                child = partials[pl.ds(jnp.maximum(cid, 0), 1)][0]
                terms = []
                for c in range(C):
                    p = pmats_ref[c, pl.ds(jnp.maximum(cid, 0), 1)][0]
                    terms.append(
                        jnp.dot(p, child[c],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST))
                return prod * jnp.stack(terms, axis=0)

            prod = jax.lax.cond(cid >= 0, apply_child, lambda p: p, prod)
        m = jnp.maximum(jnp.max(prod, axis=1), 1e-30)  # (C, S)
        partials[pl.ds(node, 1)] = (prod / m[:, None, :])[None]
        logscale[...] = logscale[...] + jnp.log(m)
        return 0

    jax.lax.fori_loop(0, n_int, node_step, 0)

    root = partials[pl.ds(n_leaves + n_int - 1, 1)][0]  # (C, A_PAD, S)
    pi = pi_ref[0, :]  # (A_PAD,)
    site_cat = jnp.log(jnp.maximum(
        jnp.sum(root * pi[None, :, None], axis=1), 1e-30)) + logscale[...]
    # logsumexp over categories with equal weights
    mx = jnp.max(site_cat, axis=0)
    ll = mx + jnp.log(jnp.mean(jnp.exp(site_cat - mx[None, :]), axis=0))
    out_ref[0, :] = ll


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def pruning_site_ll_pallas(codes: jax.Array, children: jax.Array,
                           pmats: jax.Array, pi: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """Per-site log-likelihood via the Pallas site-tiled kernel.

    codes: (n_leaves, L) int8, L a multiple of S_TILE (PAD-fill).
    children: (n_int, 3) int32 postorder.
    pmats: (C, V, A_PAD, A_PAD) f32 from `pad_pmats`.
    pi: (1, A_PAD) f32.
    """
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    V = n_leaves + n_int
    C = pmats.shape[0]
    grid = (L // S_TILE,)

    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, S_TILE), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, V, A_PAD, A_PAD),
                             lambda i, *_: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A_PAD), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S_TILE), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((V, C, A_PAD, S_TILE), jnp.float32),
                pltpu.VMEM((C, S_TILE), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        interpret=interpret,
    )(children, codes, pmats, pi)[0]


def pad_pmats(model, blen: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(C, V, A_PAD, A_PAD) transition matrices + (1, A_PAD) pi for the
    kernel (identity on the padded states so they never contribute)."""
    from pepr_tpu.ops.likelihood import transition_matrices

    pm = np.asarray(transition_matrices(model, jnp.asarray(blen)))
    C, V = pm.shape[:2]
    out = np.zeros((C, V, A_PAD, A_PAD), np.float32)
    out[:, :, :N_AA, :N_AA] = pm
    pi = np.zeros((1, A_PAD), np.float32)
    pi[0, :N_AA] = np.asarray(model.pi)
    return out, pi


def loglik_pallas(codes: np.ndarray, children: np.ndarray,
                  blen: np.ndarray, model, site_weights=None,
                  interpret: bool = False) -> float:
    """Drop-in (total weighted LL) built on the Pallas kernel."""
    from pepr_tpu.alphabet import PAD

    codes = np.asarray(codes, np.int8)
    n_leaves, L = codes.shape
    Lp = int(np.ceil(L / S_TILE) * S_TILE)
    if Lp != L:
        pad = np.full((n_leaves, Lp - L), PAD, np.int8)
        codes = np.concatenate([codes, pad], axis=1)
    pmats, pi = pad_pmats(model, blen)
    ll = pruning_site_ll_pallas(jnp.asarray(codes),
                                jnp.asarray(children, jnp.int32),
                                jnp.asarray(pmats), jnp.asarray(pi),
                                interpret=interpret)
    ll = ll[:L]
    if site_weights is not None:
        ll = ll * jnp.asarray(np.asarray(site_weights, np.float32))
    return float(jnp.sum(ll))
