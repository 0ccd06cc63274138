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
RESCALE_EVERY = 2  # rescale cadence over internal nodes (see _kernel)
UNROLL_MAX_NODES = 40  # fully unroll the node walk for trees this small

# MXU dot mode for the pruning kernels.  "bf16x3" decomposes each f32
# operand into bf16 hi + lo parts and computes hi@hi + hi@lo + lo@hi
# (f32 accumulation) — 3 MXU passes per dot instead of HIGHEST's 6,
# with ~1e-5 relative accuracy (the dropped lo@lo term is <= 2^-18).
# Mosaic has no native Precision.HIGH, so the split is done by hand;
# pmats arrive pre-split, partials are split per dot on the VPU.
# "highest" reconstructs f32 operands and uses one HIGHEST dot (the
# r4 behavior) — kept for A/B numerics checks via
# PEPR_PRUNING_DOT=highest.  The r4 NaN-gradient failure was a single
# bf16 pass (DEFAULT), which neither mode uses.
def dot_mode() -> str:
    import os
    m = os.environ.get("PEPR_PRUNING_DOT", "bf16x3")
    return m if m in ("bf16x3", "highest") else "bf16x3"


def split_bf16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 -> (hi, lo) bf16 parts with hi + lo ~= x (lo exact to
    ~2^-18 relative).

    The split is done by INTEGER mantissa masking (+0x8000 rounds to
    nearest bf16), not by a bf16 cast pair: XLA's excess-precision
    simplifier rewrites `f32(bf16(x))` back to `x`, which silently
    zeroes the lo part and degrades the whole scheme to a single bf16
    pass (measured 1.4e-3 max rel error vs 2.6e-6 with the masked
    split on the real chip — an optimization_barrier does NOT stop
    it; the bitcast+and is opaque to the rewrite)."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi_f = jax.lax.bitcast_convert_type(
        (xi + jnp.int32(0x8000)) & jnp.int32(-65536), jnp.float32)
    return hi_f.astype(jnp.bfloat16), (x - hi_f).astype(jnp.bfloat16)


def _kdot(p_hi, p_lo, other, mode: str, dims=None):
    """Kernel dot: pre-split left operand (bf16 hi/lo) times an f32
    right operand, in the selected mode.  `dims` selects a
    dot_general contraction (defaults to plain matmul)."""
    if dims is None:
        def d(a, b, prec):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)
    else:
        def d(a, b, prec):
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32,
                precision=prec)
    if mode == "highest":
        p = p_hi.astype(jnp.float32) + p_lo.astype(jnp.float32)
        return d(p, other, jax.lax.Precision.HIGHEST)
    if mode == "bf16x1":  # timing ablation only — NOT accurate
        return d(p_hi, other.astype(jnp.bfloat16),
                 jax.lax.Precision.DEFAULT)
    o_hi, o_lo = split_bf16(other)
    prec = jax.lax.Precision.DEFAULT
    return (d(p_hi, o_hi, prec) + d(p_hi, o_lo, prec)
            + d(p_lo, o_hi, prec))


def _kdot_ff(a, b, mode: str, dims):
    """Kernel dot of two runtime f32 operands (both split in-kernel
    under bf16x3)."""
    if mode == "highest":
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    a_hi, a_lo = split_bf16(a)
    return _kdot(a_hi, a_lo, b, "bf16x3", dims)


def _kernel(children_ref, codes_ref, pmats_hi_ref, pmats_lo_ref,
            pi_ref, out_ref, partials, logscale, *, mode: str):
    """One site tile.

    children_ref: (n_int, 3) int32 in SMEM (scalar-prefetched)
    codes_ref: (n_leaves, S) int8 tile in VMEM
    pmats_hi/lo_ref: (V, CA, CA) bf16 in VMEM — per-node transition
               matrices split into bf16 hi/lo parts (split_bf16),
               block-diagonal over the C categories (row a = parent
               state, padded/off-block region zero)
    pi_ref: (1, A_PAD) f32
    out_ref: (1, S) f32 per-site log-likelihood
    partials: VMEM scratch (V, CA, S)
    logscale: VMEM scratch (1, S) — ONE shared scale per site (the
        rescale factor is the max over the whole fused CxA axis, so
        every category carries the same accumulated log-scale)
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

    logscale[...] = jnp.zeros((1, S), jnp.float32)

    def node_step(i, _):
        node = n_leaves + i

        def child_term(cid):
            child = partials[pl.ds(jnp.maximum(cid, 0), 1)][0]
            p_hi = pmats_hi_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
            p_lo = pmats_lo_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
            # ONE fused MXU dot over all categories (block-diag)
            return _kdot(p_hi, p_lo, child, mode)

        # first two children are unconditional (every internal node of
        # a (un)rooted binary tree has >= 2 children — kernel-array
        # convention, tree_to_arrays); only the root trifurcation's
        # third child needs the predicated branch, so the hot dots
        # pipeline without per-step control flow
        prod = child_term(children_ref[i, 0]) \
            * child_term(children_ref[i, 1])
        cid2 = children_ref[i, 2]
        prod = jax.lax.cond(
            cid2 >= 0, lambda p: p * child_term(cid2), lambda p: p, prod)

        # rescale with ONE shared factor per site (max over the whole
        # fused category x state axis) and only every RESCALE_EVERY-th
        # node: values only shrink (P row sums <= 1, tips <= 1), and
        # anything below ~1e-38 RELATIVE to the per-site max
        # contributes nothing to the final logsumexp, so sparser,
        # shared rescaling is exact — and it removes most of the
        # epilogue's strided max / div / log VPU work, which dominated
        # once the dots dropped to 3 passes
        if isinstance(i, int):  # unrolled: the predicate is static
            if i % RESCALE_EVERY == RESCALE_EVERY - 1 or i == n_int - 1:
                m = jnp.maximum(jnp.max(prod, axis=0), 1e-30)  # (S,)
                logscale[...] = logscale[...] + jnp.log(m)[None, :]
                partials[pl.ds(node, 1)] = \
                    (prod * pl.reciprocal(m, approx=False)[None, :]
                     ).reshape(1, CA, S)
            else:
                partials[pl.ds(node, 1)] = prod.reshape(1, CA, S)
            return 0

        resc = (i % RESCALE_EVERY == RESCALE_EVERY - 1) | (i == n_int - 1)

        @pl.when(resc)
        def _rescaled():
            m = jnp.maximum(jnp.max(prod, axis=0), 1e-30)  # (S,)
            logscale[...] = logscale[...] + jnp.log(m)[None, :]
            partials[pl.ds(node, 1)] = \
                (prod * pl.reciprocal(m, approx=False)[None, :]
                 ).reshape(1, CA, S)

        @pl.when(jnp.logical_not(resc))
        def _raw():
            partials[pl.ds(node, 1)] = prod.reshape(1, CA, S)
        return 0

    # fully unroll small trees: the fori_loop's per-iteration
    # bookkeeping costs ~10% at bench size (measured on-chip); large
    # trees keep the rolled loop to bound Mosaic compile time
    if n_int <= UNROLL_MAX_NODES:
        for i in range(n_int):
            node_step(i, 0)
    else:
        jax.lax.fori_loop(0, n_int, node_step, 0)

    root = partials[pl.ds(n_leaves + n_int - 1, 1)][0].reshape(
        C, A_PAD, S)
    pi = pi_ref[0, :]  # (A_PAD,)
    site_cat = jnp.log(jnp.maximum(
        jnp.sum(root * pi[None, :, None], axis=1), 1e-30)) \
        + logscale[...]  # (C, S); logscale row broadcasts
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


S_TILES = (512, 256, 128)  # candidate site tiles, widest first


def s_tile_for(n_nodes: int, grad: bool = False,
               budget: int = 12 * 2 ** 20) -> int | None:
    """Widest site tile whose VMEM footprint fits `n_nodes`, or None
    when even the narrowest does not (XLA-scan territory).  The r4
    kernel was fixed at 512 and simply refused trees past ~45 nodes;
    narrowing the tile keeps the all-nodes-resident layout viable to
    ~110 nodes forward (the backward's upper-messages + gradient
    accumulator put its ceiling near ~55 nodes)."""
    fn = pallas_vmem_bytes_grad if grad else pallas_vmem_bytes
    for s in S_TILES:
        if fn(n_nodes, s) <= budget:
            return s
    return None


def pallas_fits(n_nodes: int, budget: int = 12 * 2 ** 20) -> bool:
    """Whether the site-tiled kernel's all-nodes-resident VMEM layout
    fits this tree size at ANY tile width (beyond it the XLA scan path
    must be used)."""
    return s_tile_for(n_nodes, budget=budget) is not None


def pallas_vmem_bytes_grad(n_nodes: int, s_tile: int = S_TILE) -> int:
    """Estimated VMEM footprint of the BACKWARD kernel's site-tile
    program (ops/pallas_pruning_grad.py): forward partials + `upper`
    messages + logm scratch + pmats + the (V, CA, CA) gradient output.
    n_int ~= n_nodes/2 for (un)rooted binary trees."""
    n_int = max(n_nodes // 2, 1)
    return 4 * (n_nodes * CA * s_tile          # partials
                + n_int * CA * s_tile          # upper messages
                + n_int * N_CATS * s_tile      # logm
                + N_CATS * s_tile              # logscale
                + 2 * n_nodes * CA * CA)       # pmats + grad accumulator


def pallas_fits_grad(n_nodes: int, budget: int = 12 * 2 ** 20) -> bool:
    """Whether the backward (gradient) kernel also fits VMEM at this
    tree size — differentiated calls must gate on THIS, not
    pallas_fits: the backward adds ~1.5-1.6x the forward footprint."""
    return s_tile_for(n_nodes, grad=True, budget=budget) is not None


def chosen_tile(n_nodes: int) -> int:
    """The tile the forward/backward kernel PAIR agrees on: the grad
    tile when the backward fits at all (so a later grad of the same
    forward shares the padding), else the forward tile (grad paths
    are gated off upstream at such sizes).  Raises when neither fits —
    callers must gate on pallas_fits first."""
    s = s_tile_for(n_nodes, grad=True)
    if s is None:
        s = s_tile_for(n_nodes, grad=False)
    if s is None:
        raise ValueError(f"tree of {n_nodes} nodes exceeds the Pallas "
                         "kernel's VMEM budget at every tile width")
    return s


@functools.partial(jax.jit,
                   static_argnames=("interpret", "mode"))
def pruning_site_ll_pallas(codes: jax.Array, children: jax.Array,
                           pmats_bd: jax.Array, pi: jax.Array,
                           interpret: bool = False,
                           mode: str | None = None) -> jax.Array:
    """Per-site log-likelihood via the Pallas site-tiled kernel.

    codes: (n_leaves, L) int8, L a multiple of S_TILE (PAD-fill).
    children: (n_int, 3) int32 postorder; rows must have children in
        slots 0/1 (binary convention; only the root may fill slot 2).
    pmats_bd: (V, CA, CA) f32 from `block_diag_pmats`.
    pi: (1, A_PAD) f32.
    """
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    V = n_leaves + n_int
    s_tile = chosen_tile(V)
    if L % s_tile:
        raise ValueError(f"L={L} not a multiple of the {s_tile} tile")
    grid = (L // s_tile,)
    mode = dot_mode() if mode is None else mode
    p_hi, p_lo = split_bf16(pmats_bd)

    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, s_tile), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, CA, CA),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, CA, CA),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A_PAD), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, s_tile), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((V, CA, s_tile), jnp.float32),
                pltpu.VMEM((1, s_tile), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        interpret=interpret,
    )(children, codes, p_hi, p_lo, pi)[0]


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
    s_tile = chosen_tile(n_leaves + len(children))
    Lp = int(np.ceil(L / s_tile) * s_tile)
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
