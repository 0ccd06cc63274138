"""Pallas TPU kernel for Felsenstein pruning site log-likelihoods.

The XLA-scan engine (ops/likelihood.py) streams the (n_nodes, C, L, 20)
partials buffer through HBM on every node step.  This kernel tiles the
site axis instead: each grid program holds ALL node partials for a
block of sites in VMEM (n_nodes x C*A_PAD x S_tile floats), walks the
whole tree for that block, and writes the per-site log-likelihood —
the speed-of-light layout for this computation (partials never leave
VMEM between nodes).

Layout notes (see the TPU tiling constraints): sites ride the 128-wide
lane dimension; the Gamma categories and the 20 amino-acid states are
FUSED into one 96-sublane axis (C=4 categories x 24 padded states) so
each per-child update is a single (96x96) @ (96xS) MXU contraction
against a block-diagonal transition matrix — r3 ran C separate
(24x24) dots per child, each stranding the 128x128 systolic array
(~4x fewer MXU passes after fusion).

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

# swept on-chip (16-taxon bench): 128 -> 11.2M, 256 -> 12.9M,
# 512 -> 14.5M, 1024 -> 7.3M site-evals/s (VMEM spill); 512 wins
S_TILE = 512
A_PAD = 24  # states padded to a sublane multiple
N_CATS = 4  # Gamma categories fused into the sublane axis
CA = N_CATS * A_PAD


def _kernel(children_ref, codes_ref, pmats_ref, pi_ref, out_ref,
            partials, logscale):
    """One site tile.

    children_ref: (n_int, 3) int32 in SMEM (scalar-prefetched)
    codes_ref: (n_leaves, S) int8 tile in VMEM
    pmats_ref: (V, CA, CA) f32 in VMEM — per-node transition matrices,
               block-diagonal over the C categories (row a = parent
               state, padded/off-block region zero)
    pi_ref: (1, A_PAD) f32
    out_ref: (1, S) f32 per-site log-likelihood
    partials: VMEM scratch (V, CA, S)
    logscale: VMEM scratch (C, S)
    """
    n_int = children_ref.shape[0]
    n_leaves = codes_ref.shape[0]
    C = N_CATS
    S = codes_ref.shape[1]

    # tip partials: one-hot over states (ambiguous codes -> all ones
    # over the LIVE states pi > 1e-6, so smaller alphabets riding the
    # 20-lane engine keep dead states exactly zero), replicated into
    # every category block of the fused sublane axis
    state_iota = jax.lax.broadcasted_iota(jnp.int32, (A_PAD, S), 0)
    live = (pi_ref[0, :] > 1e-6).astype(jnp.float32)  # (A_PAD,)
    for leaf in range(n_leaves):
        codes = codes_ref[leaf, :].astype(jnp.int32)  # (S,)
        onehot = (state_iota == codes[None, :]).astype(jnp.float32)
        ambig = (codes >= N_AA)[None, :]
        tip = jnp.where(ambig, live[:, None], onehot)  # (A_PAD, S)
        partials[leaf] = jnp.tile(tip, (C, 1))

    logscale[...] = jnp.zeros((C, S), jnp.float32)

    def node_step(i, _):
        node = n_leaves + i
        prod = jnp.ones((CA, S), jnp.float32)
        for k in range(3):
            cid = children_ref[i, k]

            def apply_child(prod):
                child = partials[pl.ds(jnp.maximum(cid, 0), 1)][0]
                p = pmats_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
                # ONE fused MXU pass over all categories (block-diag)
                return prod * jnp.dot(
                    p, child, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            prod = jax.lax.cond(cid >= 0, apply_child, lambda p: p, prod)
        pc = prod.reshape(C, A_PAD, S)
        m = jnp.maximum(jnp.max(pc, axis=1), 1e-30)  # (C, S)
        partials[pl.ds(node, 1)] = (pc / m[:, None, :]).reshape(1, CA, S)
        logscale[...] = logscale[...] + jnp.log(m)
        return 0

    jax.lax.fori_loop(0, n_int, node_step, 0)

    root = partials[pl.ds(n_leaves + n_int - 1, 1)][0].reshape(
        C, A_PAD, S)
    pi = pi_ref[0, :]  # (A_PAD,)
    site_cat = jnp.log(jnp.maximum(
        jnp.sum(root * pi[None, :, None], axis=1), 1e-30)) + logscale[...]
    # logsumexp over categories with equal weights
    mx = jnp.max(site_cat, axis=0)
    ll = mx + jnp.log(jnp.mean(jnp.exp(site_cat - mx[None, :]), axis=0))
    out_ref[0, :] = ll


def block_diag_pmats(pm: jax.Array) -> jax.Array:
    """(C, V, 20, 20) category transition matrices -> (V, CA, CA)
    block-diagonal form for the fused kernel."""
    C, V = pm.shape[:2]
    if C != N_CATS:
        raise ValueError(f"kernel is compiled for {N_CATS} categories")
    out = jnp.zeros((V, CA, CA), jnp.float32)
    for c in range(C):
        a0 = c * A_PAD
        out = out.at[:, a0:a0 + N_AA, a0:a0 + N_AA].set(pm[c])
    return out


def pallas_vmem_bytes(n_nodes: int, s_tile: int = S_TILE) -> int:
    """Estimated VMEM footprint of one site-tile program (partials +
    block-diag pmats + small fixed buffers)."""
    return 4 * (n_nodes * CA * s_tile + n_nodes * CA * CA
                + N_CATS * s_tile + 2 * CA * s_tile)


def pallas_fits(n_nodes: int, budget: int = 12 * 2 ** 20) -> bool:
    """Whether the site-tiled kernel's all-nodes-resident VMEM layout
    fits this tree size (beyond it the XLA scan path must be used)."""
    return pallas_vmem_bytes(n_nodes) <= budget


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def pruning_site_ll_pallas(codes: jax.Array, children: jax.Array,
                           pmats_bd: jax.Array, pi: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """Per-site log-likelihood via the Pallas site-tiled kernel.

    codes: (n_leaves, L) int8, L a multiple of S_TILE (PAD-fill).
    children: (n_int, 3) int32 postorder.
    pmats_bd: (V, CA, CA) f32 from `block_diag_pmats`.
    pi: (1, A_PAD) f32.
    """
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    V = n_leaves + n_int
    grid = (L // S_TILE,)

    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, S_TILE), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, CA, CA),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A_PAD), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S_TILE), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((V, CA, S_TILE), jnp.float32),
                pltpu.VMEM((N_CATS, S_TILE), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        interpret=interpret,
    )(children, codes, pmats_bd, pi)[0]


def pad_pmats(model, blen: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(V, CA, CA) block-diagonal transition matrices + (1, A_PAD) pi
    for the kernel."""
    from pepr_tpu.ops.likelihood import transition_matrices

    pm = jnp.asarray(transition_matrices(model, jnp.asarray(blen)))
    out = np.asarray(block_diag_pmats(pm))
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


# -- differentiable entry (custom VJP over the backward kernel) ------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def site_ll_pallas_diff(codes, children, pmats_bd, pi,
                        interpret: bool = False):
    """Per-site ll with a gradient path w.r.t. `pmats_bd` (the
    backward Pallas kernel, ops/pallas_pruning_grad.py).  codes /
    children are integer inputs (no tangents); pi is treated as a
    constant (branch-length optimization never differentiates it)."""
    return pruning_site_ll_pallas(codes, children, pmats_bd, pi,
                                  interpret=interpret)


def _sll_fwd(codes, children, pmats_bd, pi, interpret):
    out = pruning_site_ll_pallas(codes, children, pmats_bd, pi,
                                 interpret=interpret)
    return out, (codes, children, pmats_bd, pi)


def _sll_bwd(interpret, res, ct):
    from jax.dtypes import float0

    from pepr_tpu.ops.pallas_pruning_grad import pruning_grad_pmats_pallas
    codes, children, pmats_bd, pi = res
    gp = pruning_grad_pmats_pallas(codes, children, pmats_bd, pi,
                                   ct, interpret=interpret)
    return (np.zeros(codes.shape, dtype=float0),
            np.zeros(children.shape, dtype=float0),
            gp, jnp.zeros_like(pi))


site_ll_pallas_diff.defvjp(_sll_fwd, _sll_bwd)
