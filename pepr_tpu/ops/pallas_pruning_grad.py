"""Backward Pallas kernel for the site-tiled pruning forward.

Gives the site-tiled forward (ops/pallas_pruning.py) a gradient path
w.r.t. the block-diagonal transition matrices, so branch-length
optimization — the dominant stage-2 cost (it runs inside every NNI
acceptance and all 100 jackknife replicates; RAxMLRunner.java:215-280's
`-f e` role) — no longer falls back to the XLA scan.

Math (per site s, Gamma category c).  For edge e above node v with
parent u:  dL_c/dP_e(a,b) = M_v(a) D_v(b), where D is the lower
(Felsenstein) partial and M_v = U_u * prod_{siblings w} (P_w D_w) is
the upper message excluding v.  With the forward's per-node max
rescaling (D~_v = D_v / exp(sigma_v), logscale = sum of all log m_u),
choosing the upper rescale factor of each child to be its PARENT'S
forward factor m_u makes every node's total scale equal logscale, and

  d ll_s / dP^c_e(a,b)
    = M~_v(a,s) D~_v(b,s) * exp(logscale_c - log m_u,c - ll_s - log C)

— everything needed is recomputed in one forward sweep (storing the
per-node rescale factors) followed by one reverse (preorder) sweep,
with all state VMEM-resident per site tile.  The per-edge gradient is
an MXU outer-product contraction (CA, S) @ (S, CA) accumulated over
site tiles; off-block (cross-category) entries of the fused result are
garbage by construction and are masked outside the kernel.

The cotangent vector ct (per-site) enters the coefficient, so weighted
sums (jackknife masks, bootstrap weights) differentiate exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pepr_tpu.alphabet import N_AA
from pepr_tpu.ops.pallas_pruning import (A_PAD, CA, N_CATS,
                                         RESCALE_EVERY, _kdot,
                                         _kdot_ff, dot_mode, split_bf16)


def _fwd_sweep(children_ref, codes_ref, pmats_hi_ref, pmats_lo_ref,
               pi_ref, partials, logm, logscale, mode: str):
    """Forward pruning pass storing per-internal-node rescale logs.
    Mirrors pallas_pruning._kernel exactly (same rescaling)."""
    n_int = children_ref.shape[0]
    n_leaves = codes_ref.shape[0]
    C = N_CATS
    S = codes_ref.shape[1]

    state_iota = jax.lax.broadcasted_iota(jnp.int32, (A_PAD, S), 0)
    live = (pi_ref[0, :] > 1e-6).astype(jnp.float32)
    for leaf in range(n_leaves):
        codes = codes_ref[leaf, :].astype(jnp.int32)
        onehot = (state_iota == codes[None, :]).astype(jnp.float32)
        ambig = (codes >= N_AA)[None, :]
        tip = jnp.where(ambig, live[:, None], onehot)
        partials[leaf] = jnp.tile(tip, (C, 1))

    logscale[...] = jnp.zeros((1, S), jnp.float32)

    def node_step(i, _):
        node = n_leaves + i

        def child_term(cid):
            child = partials[pl.ds(jnp.maximum(cid, 0), 1)][0]
            p_hi = pmats_hi_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
            p_lo = pmats_lo_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
            return _kdot(p_hi, p_lo, child, mode)

        # children 0/1 unconditional, matching the forward kernel
        prod = child_term(children_ref[i, 0]) \
            * child_term(children_ref[i, 1])
        cid2 = children_ref[i, 2]
        prod = jax.lax.cond(
            cid2 >= 0, lambda p: p * child_term(cid2), lambda p: p, prod)

        # shared-scale sparse rescaling — MUST mirror the forward
        # kernel exactly (pallas_pruning._kernel); logm stores the
        # per-node factor (zero on skipped nodes)
        def _do_rescale():
            m = jnp.maximum(jnp.max(prod, axis=0), 1e-30)  # (S,)
            lm = jnp.log(m)[None, :]
            logscale[...] = logscale[...] + lm
            logm[pl.ds(i, 1)] = lm[None]
            partials[pl.ds(node, 1)] = \
                (prod * pl.reciprocal(m, approx=False)[None, :]
                 ).reshape(1, CA, S)

        def _no_rescale():
            logm[pl.ds(i, 1)] = jnp.zeros((1, 1, S), jnp.float32)
            partials[pl.ds(node, 1)] = prod.reshape(1, CA, S)

        if isinstance(i, int):  # unrolled: static predicate
            if i % RESCALE_EVERY == RESCALE_EVERY - 1 or i == n_int - 1:
                _do_rescale()
            else:
                _no_rescale()
            return 0

        resc = (i % RESCALE_EVERY == RESCALE_EVERY - 1) | (i == n_int - 1)
        pl.when(resc)(_do_rescale)
        pl.when(jnp.logical_not(resc))(_no_rescale)
        return 0

    from pepr_tpu.ops.pallas_pruning import UNROLL_MAX_NODES
    if n_int <= UNROLL_MAX_NODES:
        for i in range(n_int):
            node_step(i, 0)
    else:
        jax.lax.fori_loop(0, n_int, node_step, 0)


def _bwd_kernel(children_ref, codes_ref, pmats_hi_ref, pmats_lo_ref,
                pi_ref, ct_ref, grad_ref, partials, logm, logscale,
                upper, *, mode: str):
    """One site tile: forward recompute + reverse sweep accumulating
    d(sum_s ct_s * ll_s)/dP into grad_ref (V, CA, CA).

    upper: VMEM scratch (n_int, CA, S) — rescaled upper partials U~ of
    every internal node.
    """
    n_int = children_ref.shape[0]
    n_leaves = codes_ref.shape[0]
    C = N_CATS
    S = codes_ref.shape[1]

    _fwd_sweep(children_ref, codes_ref, pmats_hi_ref, pmats_lo_ref,
               pi_ref, partials, logm, logscale, mode)

    # per-site ll (identical to the forward kernel's epilogue)
    root = partials[pl.ds(n_leaves + n_int - 1, 1)][0].reshape(
        C, A_PAD, S)
    pi = pi_ref[0, :]
    site_cat = jnp.log(jnp.maximum(
        jnp.sum(root * pi[None, :, None], axis=1), 1e-30)) + logscale[...]
    mx = jnp.max(site_cat, axis=0)
    lse = mx + jnp.log(jnp.sum(jnp.exp(site_cat - mx[None, :]), axis=0))
    # note: ll = lse - log C, and the coefficient uses ll + log C = lse

    @pl.when(pl.program_id(0) == 0)
    def _init():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    ct = ct_ref[0, :]  # (S,)

    # root's upper partial: pi in every category block, total scale =
    # logscale by construction (tau_root = 0)
    upper[pl.ds(n_int - 1, 1)] = jnp.tile(
        jnp.broadcast_to(pi[:, None], (A_PAD, S)), (C, 1))[None]

    def node_step(j, _):
        i = n_int - 1 - j  # reverse preorder over internal nodes
        u_node = upper[pl.ds(i, 1)][0]  # (CA, S) rescaled upper U~_u
        # coefficient exp(logscale - logm_u - lse) * ct, shared across
        # categories and states (scales are per-site under the
        # shared-scale scheme); broadcasts against (CA, S) operands
        coef_ca = jnp.exp(logscale[...] - logm[pl.ds(i, 1)][0]
                          - lse[None, :]) * ct[None, :]  # (1, S)

        # child messages T~_w = P_w D~_w (children 0/1 unconditional,
        # matching the forward kernel's convention)
        def mk(cid):
            child = partials[pl.ds(jnp.maximum(cid, 0), 1)][0]
            p_hi = pmats_hi_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
            p_lo = pmats_lo_ref[pl.ds(jnp.maximum(cid, 0), 1)][0]
            return _kdot(p_hi, p_lo, child, mode)

        cid2 = children_ref[i, 2]
        msgs = [mk(children_ref[i, 0]), mk(children_ref[i, 1]),
                jax.lax.cond(cid2 >= 0, mk,
                             lambda _: jnp.ones((CA, S), jnp.float32),
                             cid2)]

        def edge_body(k, cid):
            others = u_node
            for k2 in range(3):
                if k2 != k:
                    others = others * msgs[k2]
            m_v = others  # (CA, S) upper message excluding child k
            idx = jnp.maximum(cid, 0)
            child = partials[pl.ds(idx, 1)][0]
            m_hat = m_v * coef_ca
            # per-edge gradient outer product over sites
            g = _kdot_ff(m_hat, child, mode,
                         (((1,), (1,)), ((), ())))  # (CA, CA)
            grad_ref[pl.ds(idx, 1)] = grad_ref[pl.ds(idx, 1)] + \
                g[None]

            # push the upper partial down to internal children,
            # rescaled by THIS node's forward factor m_u
            @pl.when(cid >= n_leaves)
            def _push():
                p_hi = pmats_hi_ref[pl.ds(idx, 1)][0]
                p_lo = pmats_lo_ref[pl.ds(idx, 1)][0]
                u_child = _kdot(p_hi, p_lo, m_v, mode,
                                (((0,), (0,)), ((), ())))  # (CA, S)
                scale = jnp.exp(-logm[pl.ds(i, 1)][0])  # (1, S)
                upper[pl.ds(cid - n_leaves, 1)] = \
                    (u_child * scale)[None]

        edge_body(0, children_ref[i, 0])
        edge_body(1, children_ref[i, 1])

        @pl.when(cid2 >= 0)
        def _edge2():
            edge_body(2, cid2)
        return 0

    from pepr_tpu.ops.pallas_pruning import UNROLL_MAX_NODES
    if n_int <= UNROLL_MAX_NODES:
        for j in range(n_int):
            node_step(j, 0)
    else:
        jax.lax.fori_loop(0, n_int, node_step, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def pruning_grad_pmats_pallas(codes: jax.Array, children: jax.Array,
                              pmats_bd: jax.Array, pi: jax.Array,
                              ct: jax.Array,
                              interpret: bool = False,
                              mode: str | None = None) -> jax.Array:
    """d(sum_s ct_s * ll_s)/d pmats_bd, (V, CA, CA).

    codes: (n_leaves, L) int8, L a multiple of the chosen tile.
    ct: (L,) f32 per-site cotangents (e.g. site weights).
    Off-block (cross-category) entries are zero-masked.
    """
    from pepr_tpu.ops.pallas_pruning import chosen_tile
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    V = n_leaves + n_int
    s_tile = chosen_tile(V)  # matches the forward kernel's padding
    if L % s_tile:
        raise ValueError(f"L={L} not a multiple of the {s_tile} tile")
    grid = (L // s_tile,)
    mode = dot_mode() if mode is None else mode
    p_hi, p_lo = split_bf16(pmats_bd)

    grad = pl.pallas_call(
        functools.partial(_bwd_kernel, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, s_tile), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, CA, CA), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, CA, CA), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A_PAD), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_tile), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((V, CA, CA), lambda i, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((V, CA, s_tile), jnp.float32),
                pltpu.VMEM((n_int, 1, s_tile), jnp.float32),
                pltpu.VMEM((1, s_tile), jnp.float32),
                pltpu.VMEM((n_int, CA, s_tile), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((V, CA, CA), jnp.float32),
        interpret=interpret,
    )(children, codes, p_hi, p_lo, pi, ct.reshape(1, L))
    # zero the off-block region (fused outer products put garbage in
    # the cross-category blocks, which block_diag_pmats never reads
    # but whose cotangents must be exact zeros)
    mask = jnp.zeros((CA, CA), jnp.float32)
    for c in range(N_CATS):
        a0 = c * A_PAD
        mask = mask.at[a0:a0 + A_PAD, a0:a0 + A_PAD].set(1.0)
    return grad * mask[None]
