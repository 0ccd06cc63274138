"""ML tree inference: NJ start + gradient branch lengths + batched NNI.

The tree-construction replacement for the reference's method dispatch
(PhylogeneticTreeBuilder.java:97-129 `ml`/`FastTree`/`nj`): a
Kimura-corrected distance NJ starting topology, branch lengths by
optax/adam on softplus-parameterized lengths through the differentiable
pruning kernel (instead of RAxML's per-branch Brent loops), and
hill-climbing NNI rounds where every candidate topology in a round is
scored in one vmapped batch — the "device batch-scores many candidate
topologies" design the survey prescribes for ML search on accelerators.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pepr_tpu.alphabet import GAP, N_AA, PAD
from pepr_tpu.ops.likelihood import (TreeArrays, WagModel, arrays_to_tree,
                                     loglik_sites, tree_to_arrays)
from pepr_tpu.tree.basic import Tree
from pepr_tpu.tree.nj import neighbor_joining


# -- distances -------------------------------------------------------------

def protein_distances(mat: np.ndarray, site_weights: np.ndarray | None = None,
                      max_dist: float = 5.0) -> np.ndarray:
    """Kimura-corrected pairwise distances d = -ln(1 - p - p^2/5) over
    shared non-gap columns (the protein-distance convention FastTree
    uses for its NJ phase)."""
    n, L = mat.shape
    valid = (mat < N_AA)
    w = np.ones(L) if site_weights is None else np.asarray(site_weights)
    d = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            both = valid[i] & valid[j]
            wt = w * both
            tot = wt.sum()
            if tot <= 0:
                p = 0.75
            else:
                p = float((wt * (mat[i] != mat[j])).sum() / tot)
            arg = 1.0 - p - 0.2 * p * p
            dist = max_dist if arg <= 1e-6 else min(-np.log(arg), max_dist)
            d[i, j] = d[j, i] = dist
    return d


def nj_start_tree(mat: np.ndarray, taxa: list[str],
                  site_weights: np.ndarray | None = None) -> Tree:
    d = protein_distances(mat, site_weights)
    return neighbor_joining(d, taxa)


# -- branch length optimization -------------------------------------------

def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _inv_softplus(y):
    y = np.maximum(y, 1e-6)
    return np.where(y > 20, y, np.log(np.expm1(y)))


@functools.partial(jax.jit, static_argnames=("steps",))
def _opt_blens_jit(codes, children, theta0, eig, u, ui, pi, rates,
                   weights, steps: int):
    opt = optax.adam(0.03)

    def nll(theta):
        blen = _softplus(theta)
        ll = loglik_sites(codes, children, blen, eig, u, ui, pi, rates)
        return -(ll * weights).sum()

    val_grad = jax.value_and_grad(nll)

    def body(carry, _):
        theta, state = carry
        loss, g = val_grad(theta)
        updates, state = opt.update(g, state, theta)
        theta = optax.apply_updates(theta, updates)
        return (theta, state), loss

    (theta, _), losses = jax.lax.scan(body, (theta0, opt.init(theta0)),
                                      None, length=steps)
    return theta, -losses[-1]


def optimize_branch_lengths(codes: np.ndarray, arr: TreeArrays,
                            model: WagModel,
                            site_weights: np.ndarray | None = None,
                            steps: int = 200) -> tuple[np.ndarray, float]:
    """Maximize LL over all branch lengths jointly; returns (blen, ll)."""
    L = codes.shape[1]
    w = np.ones(L, np.float32) if site_weights is None else \
        np.asarray(site_weights, np.float32)
    theta0 = jnp.asarray(_inv_softplus(np.asarray(arr.blen, np.float64))
                         .astype(np.float32))
    theta, ll = _opt_blens_jit(
        jnp.asarray(codes), jnp.asarray(arr.children), theta0,
        jnp.asarray(model.eig), jnp.asarray(model.u),
        jnp.asarray(model.u_inv), jnp.asarray(model.pi),
        jnp.asarray(model.rates), jnp.asarray(w), steps)
    return np.asarray(_softplus(theta), np.float32), float(ll)


# -- NNI search ------------------------------------------------------------

@dataclass
class _Edge:
    node: int  # child internal node (kernel id)
    parent: int  # parent internal node (kernel id)


def _internal_edges(children: np.ndarray, n_leaves: int) -> list[_Edge]:
    out = []
    n_int = children.shape[0]
    for k in range(n_int):
        for c in children[k]:
            if c >= n_leaves:
                out.append(_Edge(int(c), n_leaves + k))
    return out


def _nni_candidates(children: np.ndarray, n_leaves: int) -> list[np.ndarray]:
    """All NNI rearrangements: for each internal edge (p -> c), swap one
    child of c with one sibling of c under p.  Returns new children
    arrays (same shape)."""
    cands = []
    for edge in _internal_edges(children, n_leaves):
        k_c = edge.node - n_leaves
        k_p = edge.parent - n_leaves
        c_kids = [x for x in children[k_c] if x >= 0]
        p_kids = [x for x in children[k_p] if x >= 0 and x != edge.node]
        if len(c_kids) < 2 or not p_kids:
            continue
        z = p_kids[0]  # swap partner under the parent
        for kid in c_kids[:2]:
            new = children.copy()
            # replace kid with z under c
            row_c = list(new[k_c])
            row_c[row_c.index(kid)] = z
            new[k_c] = row_c
            # replace z with kid under p
            row_p = list(new[k_p])
            row_p[row_p.index(z)] = kid
            new[k_p] = row_p
            cands.append(new)
    return cands


@jax.jit
def _score_topologies(codes, children_batch, blen_batch, eig, u, ui, pi,
                      rates, weights):
    """Score a batch of candidate topologies (each with its own branch
    lengths) in one compiled call."""

    def one(args):
        children, blen = args
        ll = loglik_sites(codes, children, blen, eig, u, ui, pi, rates)
        return (ll * weights).sum()

    return jax.lax.map(one, (children_batch, blen_batch))


def _postorder_fix(children: np.ndarray, n_leaves: int) -> np.ndarray:
    """Renumber internal nodes so children always precede parents (NNI
    swaps can break the ordering invariant the scan relies on)."""
    n_int = children.shape[0]
    kids_of = {n_leaves + k: [int(c) for c in children[k] if c >= 0]
               for k in range(n_int)}
    root = n_leaves + n_int - 1
    order: list[int] = []
    stack = [root]
    while stack:
        node = stack.pop()
        order.append(node)
        if node >= n_leaves:
            stack.extend(kids_of[node])
    order = [n for n in order[::-1] if n >= n_leaves]
    remap = {old: n_leaves + i for i, old in enumerate(order)}
    new_children = np.full_like(children, -1)
    for old, new in remap.items():
        row = []
        for c in kids_of[old]:
            row.append(remap.get(c, c))
        for ci, c in enumerate(row):
            new_children[new - n_leaves, ci] = c
    return new_children


def _remap_blen(children_old, children_new, blen, n_leaves):
    """Branch lengths live on nodes; NNI + renumbering moves internal
    node ids.  Recover the mapping by matching descendant leaf sets."""

    def leafsets(children):
        n_int = children.shape[0]
        sets = {}
        for k in range(n_int):
            node = n_leaves + k
            s = set()
            for c in children[k]:
                if c < 0:
                    continue
                s |= sets.get(int(c), {int(c)}) if c >= n_leaves \
                    else {int(c)}
            sets[node] = s
        return sets

    old_sets = {frozenset(v): k for k, v in leafsets(children_old).items()}
    new_sets = leafsets(children_new)
    blen_new = blen.copy()
    for node, s in new_sets.items():
        old = old_sets.get(frozenset(s))
        if old is not None:
            blen_new[node] = blen[old]
        else:
            blen_new[node] = 0.05  # fresh edge after the swap
    return blen_new


def ml_tree(mat: np.ndarray, taxa: list[str], model: WagModel | None = None,
            *, site_weights: np.ndarray | None = None,
            start: Tree | None = None, nni_rounds: int = 8,
            bl_steps: int = 150, bl_refine_steps: int = 60,
            max_candidates: int = 64) -> tuple[Tree, float]:
    """Full ML pipeline: NJ start -> BL opt -> NNI hill climbing.

    Returns (tree with optimized branch lengths, final log-likelihood).
    """
    if model is None:
        model = WagModel.create()
    if start is None:
        start = nj_start_tree(mat, taxa, site_weights)
    arr = tree_to_arrays(start, taxa)
    codes = np.asarray(mat, np.int8)
    n_leaves = len(taxa)
    L = codes.shape[1]
    w = np.ones(L, np.float32) if site_weights is None else \
        np.asarray(site_weights, np.float32)

    blen, ll = optimize_branch_lengths(codes, arr, model,
                                       site_weights=w, steps=bl_steps)
    arr.blen[:] = blen
    children = arr.children.copy()

    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    codes_d = jnp.asarray(codes)
    w_d = jnp.asarray(w)

    for _ in range(nni_rounds):
        cands = _nni_candidates(children, n_leaves)
        if not cands:
            break
        cands = cands[:max_candidates]
        fixed = [_postorder_fix(c, n_leaves) for c in cands]
        blens = [
            _remap_blen(children, f, arr.blen, n_leaves) for f in fixed]
        scores: list[float] = []
        chunk = 16
        pad_to = min(chunk, len(fixed))
        for c0 in range(0, len(fixed), chunk):
            cb = fixed[c0:c0 + chunk]
            bb = blens[c0:c0 + chunk]
            n_real = len(cb)
            while len(cb) < pad_to:  # keep one compiled shape
                cb = cb + [cb[-1]]
                bb = bb + [bb[-1]]
            s = _score_topologies(codes_d, jnp.asarray(np.stack(cb)),
                                  jnp.asarray(np.stack(bb)), *margs, w_d)
            scores.extend(float(x) for x in np.asarray(s)[:n_real])
        best = int(np.argmax(scores))
        if scores[best] <= ll + 1e-4:
            break
        children = fixed[best]
        arr = TreeArrays(children, blens[best], arr.node_of_tree_node,
                         arr.taxa)
        blen, ll = optimize_branch_lengths(codes, arr, model,
                                           site_weights=w,
                                           steps=bl_refine_steps)
        arr.blen[:] = blen

    final = arrays_to_tree(TreeArrays(children, arr.blen,
                                      arr.node_of_tree_node, taxa))
    return final, ll


def nj_tree(mat: np.ndarray, taxa: list[str],
            site_weights: np.ndarray | None = None) -> Tree:
    """Plain NJ tree (the reference's `-nj` fast path,
    PhylogenomicPipeline2.java:1279-1293)."""
    return nj_start_tree(mat, taxa, site_weights)


def estimate_gamma_alpha(mat: np.ndarray, taxa: list[str], tree: Tree, *,
                         grid=(0.3, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0),
                         site_weights: np.ndarray | None = None,
                         refine_iters: int = 2) -> float:
    """ML estimate of the Gamma shape on a fixed topology: coarse grid
    + golden-section refinement of the LL in alpha (the role of
    RAxML's alpha optimization inside `-f e`/`-f d`)."""
    import jax.numpy as jnp

    from pepr_tpu.ops.likelihood import loglik

    arr = tree_to_arrays(tree, taxa)
    codes = jnp.asarray(np.asarray(mat, np.int8))
    children = jnp.asarray(arr.children)
    blen = jnp.asarray(arr.blen)
    w = None if site_weights is None else \
        jnp.asarray(np.asarray(site_weights, np.float32))

    def ll(alpha: float) -> float:
        model = WagModel.create(alpha=alpha)
        return float(loglik(codes, children, blen, model,
                            site_weights=w))

    scores = [ll(a) for a in grid]
    best = int(np.argmax(scores))
    lo = grid[max(best - 1, 0)]
    hi = grid[min(best + 1, len(grid) - 1)]
    phi = (np.sqrt(5) - 1) / 2
    a, b = lo, hi
    x1 = b - phi * (b - a)
    x2 = a + phi * (b - a)
    f1, f2 = ll(x1), ll(x2)
    for _ in range(refine_iters * 3):
        if f1 < f2:
            a, x1, f1 = x1, x2, f2
            x2 = a + phi * (b - a)
            f2 = ll(x2)
        else:
            b, x2, f2 = x2, x1, f1
            x1 = b - phi * (b - a)
            f1 = ll(x1)
    return float((a + b) / 2)


def parsimony_tree(mat: np.ndarray, taxa: list[str], *,
                   site_weights: np.ndarray | None = None,
                   branch_lengths: bool = False,
                   model: WagModel | None = None,
                   nni_rounds: int = 8, bl_steps: int = 150,
                   max_candidates: int = 64) -> tuple[Tree, float]:
    """Parsimony topology search (the reference's `parsimony` method,
    RAxMLRunner.java:134-140): NJ start + NNI hill climbing under the
    Fitch kernel.  With `branch_lengths`, ML branch lengths are fitted
    on the final topology (the `parsimony_bl` two-phase,
    RAxMLRunner.java:215-280 — gradient opt instead of `-f e`).

    Returns (tree, parsimony score).
    """
    import jax.numpy as jnp

    from pepr_tpu.ops.parsimony import fitch_score_topologies

    start = nj_start_tree(mat, taxa, site_weights)
    arr = tree_to_arrays(start, taxa)
    codes = np.asarray(mat, np.int8)
    n_leaves = len(taxa)
    L = codes.shape[1]
    w = np.ones(L, np.float32) if site_weights is None else \
        np.asarray(site_weights, np.float32)
    codes_d = jnp.asarray(codes)
    w_d = jnp.asarray(w)

    children = arr.children.copy()
    score = float(fitch_score_topologies(
        codes_d, jnp.asarray(children[None]), w_d)[0])
    for _ in range(nni_rounds):
        cands = _nni_candidates(children, n_leaves)
        if not cands:
            break
        cands = [_postorder_fix(c, n_leaves)
                 for c in cands[:max_candidates]]
        scores: list[float] = []
        for c0 in range(0, len(cands), 16):
            cb = cands[c0:c0 + 16]
            n_real = len(cb)
            while len(cb) < min(16, len(cands)):
                cb = cb + [cb[-1]]
            s = fitch_score_topologies(codes_d,
                                       jnp.asarray(np.stack(cb)), w_d)
            scores.extend(float(x) for x in np.asarray(s)[:n_real])
        best = int(np.argmin(scores))
        if scores[best] >= score:
            break
        score = scores[best]
        children = cands[best]

    arr = TreeArrays(children, arr.blen, arr.node_of_tree_node, taxa)
    if branch_lengths:
        if model is None:
            model = WagModel.create()
        blen, _ = optimize_branch_lengths(codes, arr, model,
                                          site_weights=w, steps=bl_steps)
        arr.blen[:] = blen
    return arrays_to_tree(arr), score
