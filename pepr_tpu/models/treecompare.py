"""Offline tree comparison (TreeComparison.java parity).

- Robinson-Foulds distance (:567-571) — pepr_tpu.tree.rf_distance.
- Kuhner-Felsenstein branch-score distance, normalized (:607-747).
- Per-site log-likelihood export in Tree-Puzzle format (:812-885's
  raxml `-f g` step feeding CONSEL) — computed natively with the
  WAG+Gamma kernel, so AU tests can be run downstream on the `.sitelh`
  file without RAxML.
- Common-taxon restriction before comparison (:83-126).
"""

from __future__ import annotations

import math

import numpy as np

from pepr_tpu.ops.likelihood import WagModel, loglik_sites, tree_to_arrays
from pepr_tpu.tree import (Tree, bipartitions, remove_taxa, rf_distance,
                           unroot)
from pepr_tpu.tree.bipartition import canonical, node_leafsets, taxon_index


def restrict_to_common_taxa(t1: Tree, t2: Tree) -> tuple[Tree, Tree]:
    """Prune both trees to their shared taxon set
    (TreeComparison.java:83-126)."""
    s1 = set(t1.leaf_labels())
    s2 = set(t2.leaf_labels())
    common = s1 & s2
    out1 = remove_taxa(t1, s1 - common) if s1 - common else t1
    out2 = remove_taxa(t2, s2 - common) if s2 - common else t2
    return out1, out2


def _bipartition_lengths(tree: Tree, index: dict[str, int]) -> dict[int, float]:
    t = unroot(tree)
    full = (1 << len(index)) - 1
    masks = node_leafsets(t, index)
    out: dict[int, float] = {}
    root = t.root
    for node in range(t.n_nodes):
        if node == root:
            continue
        b = tree_blen = t.blen[node]
        if math.isnan(b):
            b = 0.0
        m = masks[node]
        if m == 0 or m == full:
            continue
        key = canonical(m, full)
        out[key] = out.get(key, 0.0) + float(b)
    return out


def branch_score_distance(t1: Tree, t2: Tree,
                          normalized: bool = True) -> float:
    """Kuhner-Felsenstein: sqrt of summed squared branch-length
    differences over the union of bipartitions (missing = 0); when
    `normalized`, branch lengths are first scaled by each tree's total
    length (TreeComparison.java:607-747)."""
    t1, t2 = restrict_to_common_taxa(t1, t2)
    taxa = sorted(t1.leaf_labels())
    index = taxon_index(taxa)
    b1 = _bipartition_lengths(t1, index)
    b2 = _bipartition_lengths(t2, index)
    if normalized:
        s1 = sum(b1.values()) or 1.0
        s2 = sum(b2.values()) or 1.0
        b1 = {k: v / s1 for k, v in b1.items()}
        b2 = {k: v / s2 for k, v in b2.items()}
    keys = set(b1) | set(b2)
    return float(np.sqrt(sum((b1.get(k, 0.0) - b2.get(k, 0.0)) ** 2
                             for k in keys)))


def per_site_log_likelihoods(trees: list[Tree], mat: np.ndarray,
                             taxa: list[str],
                             model: WagModel | None = None) -> np.ndarray:
    """(n_trees, L) per-site LLs under WAG+Gamma for fixed topologies
    (the `raxmlHPC -f g` role)."""
    import jax.numpy as jnp

    if model is None:
        model = WagModel.create()
    out = []
    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    codes = jnp.asarray(np.asarray(mat, np.int8))
    from pepr_tpu.ops.likelihood import forward_impl, loglik_sites_pallas
    site_fn = loglik_sites_pallas \
        if forward_impl(2 * len(taxa)) == "pallas" else loglik_sites
    for t in trees:
        arr = tree_to_arrays(t, taxa)
        ll = site_fn(codes, jnp.asarray(arr.children),
                     jnp.asarray(arr.blen), *margs)
        out.append(np.asarray(ll))
    return np.stack(out)


def sitelh_text(site_lls: np.ndarray) -> str:
    """Tree-Puzzle .sitelh format (consumable by CONSEL's makermt,
    the reference's AU-test input, TreeComparison.java:857-876)."""
    n, L = site_lls.shape
    lines = [f"  {n}  {L}"]
    for i in range(n):
        vals = " ".join(f"{x:.6f}" for x in site_lls[i])
        lines.append(f"tr{i + 1}\t{vals}")
    return "\n".join(lines) + "\n"


def compare_trees(t1: Tree, t2: Tree) -> dict:
    a, b = restrict_to_common_taxa(t1, t2)
    return {
        "rf": rf_distance(a, b),
        "branch_score": branch_score_distance(a, b, normalized=False),
        "branch_score_normalized": branch_score_distance(a, b),
        "common_taxa": len(a.leaf_labels()),
    }
