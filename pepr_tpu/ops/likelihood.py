"""Felsenstein pruning log-likelihood under WAG+Gamma on TPU.

The ML engine replacing the reference's native tree builders
(raxmlHPC `-f d/-f e/-f g` with PROTGAMMAWAG, RAxMLRunner.java:79-280;
FastTree_WAG `-gamma`, FastTreeRunner.java:67-86).

TPU-first design:
- per-edge transition matrices P(t) = U exp(L r_c t) U^-1 from the
  precomputed WAG eigensystem (batched 20x20 einsums),
- a `lax.scan` over postorder internal nodes; each step transforms the
  child partials with (sites, 20) @ (20, 20) matmuls — MXU work that
  scales with alignment length — and rescales per site, accumulating
  log-scale factors,
- sites are independent: the public entry chunks/shards the site axis,
  and per-site weights make bootstrap/jackknife replicates pure
  reweightings of the same computation,
- everything is differentiable in the branch lengths, so branch
  optimization is jax.grad + optax instead of RAxML's Brent loops.

Node convention: ids 0..n_leaves-1 are leaves (alignment row order);
internal nodes follow in postorder (children always have smaller
processing position); the last internal node is the root (up to 3
children to represent unrooted trees).  `children[i, :3]` holds child
node ids, -1 padding.  `blen[v]` is the edge above node v (root entry
ignored).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from pepr_tpu.alphabet import N_AA
from pepr_tpu.data.wag import WAG_FREQS, wag_eigensystem
from pepr_tpu.ops.gamma import discrete_gamma_rates
from pepr_tpu.tree.basic import Tree


@dataclass(frozen=True)
class WagModel:
    eig: np.ndarray  # (20,)
    u: np.ndarray  # (20, 20)
    u_inv: np.ndarray  # (20, 20)
    pi: np.ndarray  # (20,)
    rates: np.ndarray  # (C,)

    @classmethod
    def create(cls, alpha: float = 1.0, n_cats: int = 4) -> "WagModel":
        eig, u, u_inv = wag_eigensystem()
        return cls(eig.astype(np.float32), u.astype(np.float32),
                   u_inv.astype(np.float32), WAG_FREQS.astype(np.float32),
                   discrete_gamma_rates(alpha, n_cats).astype(np.float32))

    @classmethod
    def gtr_nt(cls, freqs: np.ndarray | None = None,
               rates: np.ndarray | None = None, alpha: float = 1.0,
               n_cats: int = 4) -> "WagModel":
        """Nucleotide GTR+Gamma riding the 20-state engine (FastTree
        `-gtr -nt` role, FastTreeRunner.java:67-77): the 4x4 GTR block
        sits in states 0-3 (ACGT), the 16 dead states get frequency
        1e-10 so tip masking keeps their partials exactly zero.

        freqs: (4,) base frequencies (default uniform).
        rates: (4, 4) symmetric exchangeabilities or a length-6 vector
        (AC, AG, AT, CG, CT, GT); default all-equal.
        """
        from pepr_tpu.data.protein_models import eigensystem

        f4 = np.full(4, 0.25) if freqs is None \
            else np.asarray(freqs, np.float64)
        f4 = f4 / f4.sum()
        if rates is None:
            r4 = np.ones((4, 4))
        else:
            rates = np.asarray(rates, np.float64)
            if rates.shape == (6,):
                r4 = np.zeros((4, 4))
                r4[np.triu_indices(4, 1)] = rates
                r4 = r4 + r4.T
            else:
                r4 = rates
        np.fill_diagonal(r4, 0.0)
        big_r = np.zeros((N_AA, N_AA))
        big_r[:4, :4] = r4
        pi = np.full(N_AA, 1e-10)
        pi[:4] = f4 * (1.0 - 16e-10)
        eig, u, u_inv = eigensystem(big_r, pi)
        return cls(eig.astype(np.float32), u.astype(np.float32),
                   u_inv.astype(np.float32), pi.astype(np.float32),
                   discrete_gamma_rates(alpha, n_cats).astype(np.float32))

    @classmethod
    def named(cls, name: str, alpha: float = 1.0, n_cats: int = 4,
              empirical_freqs: np.ndarray | None = None) -> "WagModel":
        """Any registered substitution model (data/protein_models.py),
        '...F' variants taking the alignment's empirical frequencies —
        the matrix-evaluation machinery's constructor
        (PhylogenomicPipeline2.java:1390-1451 role)."""
        from pepr_tpu.data.protein_models import eigensystem, resolve_model
        rates, pi = resolve_model(name, empirical_freqs)
        eig, u, u_inv = eigensystem(rates, pi)
        return cls(eig.astype(np.float32), u.astype(np.float32),
                   u_inv.astype(np.float32), pi.astype(np.float32),
                   discrete_gamma_rates(alpha, n_cats).astype(np.float32))


def tips_to_partials(codes: jax.Array, pi: jax.Array) -> jax.Array:
    """(n_leaves, L) int8 -> (n_leaves, L, 20) tip partials; ambiguity
    codes (B/Z/X/GAP/PAD >= 20) become all-ones over the LIVE states
    (pi > 1e-6).  Live-state masking is what lets smaller alphabets
    (nucleotide GTR: 4 live states, dead states pi ~ 1e-10) ride the
    same 20-lane engine — dead-state partials stay exactly zero."""
    onehot = jax.nn.one_hot(codes, N_AA, dtype=jnp.float32)
    ambiguous = (codes >= N_AA)[..., None]
    live = (pi > 1e-6).astype(jnp.float32)
    return jnp.where(ambiguous, live[None, None, :], onehot)


def transition_matrices(model: WagModel, blen: jax.Array) -> jax.Array:
    """(C, n_nodes, 20, 20) P(r_c * t_v), rows=parent state."""
    eig = jnp.asarray(model.eig)
    u = jnp.asarray(model.u)
    ui = jnp.asarray(model.u_inv)
    rates = jnp.asarray(model.rates)
    t = jnp.maximum(blen, 1e-9)
    ex = jnp.exp(eig[None, None, :] * rates[:, None, None]
                 * t[None, :, None])  # (C, V, 20)
    # clamp at zero: the f32 eigen-reconstruction can produce tiny
    # negative probabilities which snowball through per-node rescaling
    # into inf/NaN on TPU (sums/products of nonnegatives stay safe)
    return jnp.maximum(
        jnp.einsum("ab,cvb,bd->cvad", u, ex, ui,
                   precision=jax.lax.Precision.HIGHEST), 0.0)


@functools.partial(jax.jit, static_argnames=())
def loglik_sites(codes: jax.Array, children: jax.Array, blen: jax.Array,
                 eig: jax.Array, u: jax.Array, u_inv: jax.Array,
                 pi: jax.Array, rates: jax.Array) -> jax.Array:
    """Per-site log-likelihood, (L,).

    codes: (n_leaves, L) int8; children: (n_int, 3) int32;
    blen: (n_nodes,) f32.
    """
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    n_nodes = n_leaves + n_int
    C = rates.shape[0]

    tips = tips_to_partials(codes, pi)  # (n_leaves, L, 20)
    t = jnp.maximum(blen, 1e-9)
    ex = jnp.exp(eig[None, None, :] * rates[:, None, None]
                 * t[None, :, None])
    # HIGHEST precision throughout: the TPU default (bf16 passes) left
    # the pruning recursion's forward off by ~1e-3 relative and its
    # branch-length GRADIENTS NaN on real gap-heavy alignments
    pmats = jnp.maximum(
        jnp.einsum("ab,cvb,bd->cvad", u, ex, u_inv,
                   precision=jax.lax.Precision.HIGHEST), 0.0)

    # buffer of partials for every node and category
    buf = jnp.zeros((n_nodes, C, L, N_AA), jnp.float32)
    buf = buf.at[:n_leaves].set(
        jnp.broadcast_to(tips[:, None], (n_leaves, C, L, N_AA)))

    def step(carry, i):
        buf, logscale = carry
        kids = children[i]  # (3,)
        node = n_leaves + i

        def child_term(k):
            cid = kids[k]
            part = buf[jnp.maximum(cid, 0)]  # (C, L, 20)
            p = pmats[:, jnp.maximum(cid, 0)]  # (C, 20, 20)
            term = jnp.einsum("cab,clb->cla", p, part,
                              precision=jax.lax.Precision.HIGHEST)
            return jnp.where(cid >= 0, term, 1.0)

        prod = child_term(0) * child_term(1) * child_term(2)
        m = jnp.maximum(jnp.max(prod, axis=-1), 1e-30)  # (C, L)
        prod = prod / m[..., None]
        logscale = logscale + jnp.log(m)
        buf = buf.at[node].set(prod)
        return (buf, logscale), None

    logscale0 = jnp.zeros((C, L), jnp.float32)
    (buf, logscale), _ = jax.lax.scan(step, (buf, logscale0),
                                      jnp.arange(n_int))
    root = buf[n_nodes - 1]  # (C, L, 20)
    site_cat = jnp.log(jnp.maximum(
        jnp.einsum("a,cla->cl", pi, root,
                   precision=jax.lax.Precision.HIGHEST),
        1e-30)) + logscale  # (C, L)
    # equal category weights
    return jax.scipy.special.logsumexp(site_cat, axis=0) - jnp.log(C * 1.0)


def _norm_chunk(L: int, chunk: int) -> int:
    """Effective site-chunk: a power of two no larger than needed."""
    c = min(chunk, int(2 ** np.ceil(np.log2(max(L, 1)))))
    return max(int(c), 128)


# Forward-path implementation dispatch: the Pallas site-tiled kernel
# (ops/pallas_pruning.py) keeps every node's partials in VMEM for a
# block of sites — the speed-of-light layout.  Since r4 it also
# carries a custom VJP (backward Pallas kernel), so gradient paths
# (branch-length optimization) ride it too whenever the tree fits.
# Tests can pin the implementation via PEPR_LIKELIHOOD_IMPL=scan|pallas.
def forward_impl(n_nodes: int | None = None, grad: bool = False) -> str:
    """Pick the forward engine.  With `n_nodes` given, falls back to
    the scan when the site-tiled kernel's all-nodes-resident VMEM
    layout cannot fit that tree size.  Differentiated call sites pass
    `grad=True` so the gate also accounts for the BACKWARD kernel's
    larger footprint (upper messages + logm + grad accumulator)."""
    pinned = os.environ.get("PEPR_LIKELIHOOD_IMPL")
    impl = pinned
    if impl not in ("scan", "pallas"):
        try:
            platform = jax.devices()[0].platform
        except Exception:
            return "scan"
        impl = "pallas" if platform in ("tpu", "axon") else "scan"
    if impl == "pallas" and n_nodes is not None:
        from pepr_tpu.ops.pallas_pruning import pallas_fits, pallas_fits_grad
        fits = pallas_fits_grad(n_nodes) if grad else pallas_fits(n_nodes)
        if not fits:
            if pinned == "pallas":
                # an explicit pin silently measuring the scan path is
                # the failure mode bench.py was hardened against — be
                # loud (tests/benches pinning pallas must see this)
                import logging
                logging.getLogger("pepr_tpu").warning(
                    "PEPR_LIKELIHOOD_IMPL=pallas pinned but tree of "
                    "%d nodes exceeds the %s kernel's VMEM budget; "
                    "falling back to scan", n_nodes,
                    "backward" if grad else "forward")
            return "scan"
    return impl


@functools.partial(jax.jit, static_argnames=("interpret",))
def loglik_sites_pallas(codes: jax.Array, children: jax.Array,
                        blen: jax.Array, eig, u, u_inv, pi, rates,
                        interpret: bool = False) -> jax.Array:
    """Per-site log-likelihood via the Pallas site-tiled kernel (same
    signature/semantics as loglik_sites)."""
    from pepr_tpu.alphabet import PAD
    from pepr_tpu.ops.pallas_pruning import (A_PAD, block_diag_pmats,
                                             chosen_tile,
                                             pruning_site_ll_pallas)

    n_leaves, L = codes.shape
    s_tile = chosen_tile(n_leaves + children.shape[0])
    Lp = -(-L // s_tile) * s_tile
    codes_p = codes if Lp == L else \
        jnp.pad(codes, ((0, 0), (0, Lp - L)), constant_values=PAD)
    t = jnp.maximum(blen, 1e-9)
    ex = jnp.exp(eig[None, None, :] * rates[:, None, None]
                 * t[None, :, None])
    pm = jnp.maximum(
        jnp.einsum("ab,cvb,bd->cvad", u, ex, u_inv,
                   precision=jax.lax.Precision.HIGHEST),
        0.0)  # (C, V, 20, 20)
    pmp = block_diag_pmats(pm)  # (V, CA, CA)
    pip = jnp.zeros((1, A_PAD), jnp.float32).at[0, :N_AA].set(pi)
    # differentiable entry: custom VJP through the backward Pallas
    # kernel gives gradients w.r.t. blen (chained through the pmats
    # einsum above by XLA autodiff)
    from pepr_tpu.ops.pallas_pruning import site_ll_pallas_diff
    ll = site_ll_pallas_diff(codes_p, children.astype(jnp.int32),
                             pmp, pip, interpret)
    return ll[:L]


@functools.partial(jax.jit, static_argnames=("chunk", "remat", "impl"))
def loglik_weighted(codes: jax.Array, children: jax.Array, blen: jax.Array,
                    eig, u, u_inv, pi, rates, weights: jax.Array,
                    chunk: int = 4096, remat: bool = True,
                    impl: str = "scan") -> jax.Array:
    """Total weighted log-likelihood with the site axis processed in
    `chunk`-column slices via lax.scan, so live memory is ONE chunk's
    (n_nodes, C, chunk, 20) partials buffer instead of the full-L one.
    With `remat` the chunk forward is rematerialized in the backward
    pass (jax.checkpoint), bounding gradient memory the same way —
    this is what lets branch-length optimization run at golden-run
    alignment lengths (and many replicates vmapped) without OOM.

    `impl="pallas"` (forward-only paths on TPU; see forward_impl)
    skips the chunk scan entirely: the Pallas kernel tiles the site
    axis itself with all partials VMEM-resident."""
    from pepr_tpu.alphabet import PAD

    if impl == "pallas":
        ll = loglik_sites_pallas(codes, children, blen, eig, u, u_inv,
                                 pi, rates)
        return (ll * weights).sum()

    n_leaves, L = codes.shape
    Lp = -(-L // chunk) * chunk
    if Lp != L:
        codes = jnp.pad(codes, ((0, 0), (0, Lp - L)), constant_values=PAD)
        weights = jnp.pad(weights, (0, Lp - L))
    n_chunks = Lp // chunk
    codes_r = codes.reshape(n_leaves, n_chunks, chunk).transpose(1, 0, 2)
    w_r = weights.reshape(n_chunks, chunk)

    def body(acc, xs):
        cd, w = xs
        ll = loglik_sites(cd, children, blen, eig, u, u_inv, pi, rates)
        return acc + (ll * w).sum(), None

    f = jax.checkpoint(body) if remat else body
    total, _ = jax.lax.scan(f, jnp.float32(0.0), (codes_r, w_r))
    return total


def loglik(codes, children, blen, model: WagModel,
           site_weights=None, chunk: int = 8192) -> jax.Array:
    """Total (weighted) log-likelihood, chunking the site axis to bound
    the partials buffer."""
    codes = jnp.asarray(codes)
    L = codes.shape[1]
    w = jnp.ones(L, jnp.float32) if site_weights is None \
        else jnp.asarray(site_weights, jnp.float32)
    children = jnp.asarray(children)
    return loglik_weighted(
        codes, children, jnp.asarray(blen),
        jnp.asarray(model.eig), jnp.asarray(model.u),
        jnp.asarray(model.u_inv), jnp.asarray(model.pi),
        jnp.asarray(model.rates), w, chunk=_norm_chunk(L, chunk),
        remat=False,
        impl=forward_impl(codes.shape[0] + children.shape[0]))


# -- Tree <-> kernel array conversion -------------------------------------

@dataclass
class TreeArrays:
    children: np.ndarray  # (n_int, 3) int32
    blen: np.ndarray  # (n_nodes,) float32
    node_of_tree_node: np.ndarray  # kernel id per Tree node index
    taxa: list[str]  # leaf order = alignment row order

    @property
    def n_leaves(self) -> int:
        return len(self.taxa)


def tree_to_arrays(tree: Tree, taxa: list[str],
                   default_blen: float = 0.1) -> TreeArrays:
    """Convert a Tree (binary or root-trifurcating) to kernel arrays.
    `taxa` fixes the leaf-id order (alignment rows)."""
    t_index = {t: i for i, t in enumerate(taxa)}
    n_leaves = len(taxa)
    post = [int(x) for x in tree.postorder()]
    internals = [n for n in post if not tree.is_leaf(n)]
    kid_counts = [len(tree.children[n]) for n in internals]
    if max(kid_counts) > 3:
        raise ValueError("kernel supports <= 3 children per node")
    n_int = len(internals)
    kernel_id = np.full(tree.n_nodes, -1, dtype=np.int32)
    for n in post:
        if tree.is_leaf(n):
            label = tree.labels[n]
            if label not in t_index:
                raise KeyError(f"leaf {label!r} not in taxa")
            kernel_id[n] = t_index[label]
    for k, n in enumerate(internals):
        kernel_id[n] = n_leaves + k
    children = np.full((n_int, 3), -1, dtype=np.int32)
    for k, n in enumerate(internals):
        for c, kid in enumerate(tree.children[n]):
            children[k, c] = kernel_id[kid]
    blen = np.full(n_leaves + n_int, default_blen, dtype=np.float32)
    for n in post:
        b = tree.blen[n]
        if np.isfinite(b) and b >= 0:
            blen[kernel_id[n]] = max(float(b), 1e-8)
    return TreeArrays(children, blen, kernel_id, list(taxa))


def arrays_to_tree(arr: TreeArrays, supports: np.ndarray | None = None) -> Tree:
    """Kernel arrays -> Tree (for Newick output)."""
    import math
    n_leaves = arr.n_leaves
    n_int = arr.children.shape[0]
    n_nodes = n_leaves + n_int
    parent = np.full(n_nodes, -1, dtype=np.int32)
    for k in range(n_int):
        for c in arr.children[k]:
            if c >= 0:
                parent[c] = n_leaves + k
    labels: list = [arr.taxa[i] for i in range(n_leaves)] + [None] * n_int
    blen = np.array([float(b) for b in arr.blen])
    blen_out = np.where(parent >= 0, blen, math.nan)
    sup = np.full(n_nodes, math.nan)
    if supports is not None:
        sup[n_leaves:] = supports
    return Tree(parent, labels, blen_out, sup)


# -- numpy oracle ----------------------------------------------------------

def loglik_numpy_eig(codes: np.ndarray, children: np.ndarray,
                     blen: np.ndarray, model: WagModel,
                     site_weights=None) -> float:
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    C = len(model.rates)
    eig = model.eig.astype(np.float64)
    u = model.u.astype(np.float64)
    ui = model.u_inv.astype(np.float64)
    pi = model.pi.astype(np.float64)
    live = (pi > 1e-6).astype(np.float64)
    total_site = np.zeros((C, L))
    for c, r in enumerate(model.rates):
        partials = np.zeros((n_leaves + n_int, L, 20))
        for leaf in range(n_leaves):
            for s in range(L):
                code = codes[leaf, s]
                if code < 20:
                    partials[leaf, s, code] = 1.0
                else:
                    partials[leaf, s, :] = live
        for i in range(n_int):
            node = n_leaves + i
            prod = np.ones((L, 20))
            for cid in children[i]:
                if cid < 0:
                    continue
                t = max(float(blen[cid]), 1e-9)
                p = u @ np.diag(np.exp(eig * float(r) * t)) @ ui
                prod = prod * (partials[cid] @ p.T)
            partials[node] = prod
        total_site[c] = np.log(
            np.maximum(partials[n_leaves + n_int - 1] @ pi, 1e-300))
    m = total_site.max(axis=0)
    site_ll = m + np.log(np.mean(np.exp(total_site - m), axis=0))
    if site_weights is not None:
        site_ll = site_ll * site_weights
    return float(site_ll.sum())
