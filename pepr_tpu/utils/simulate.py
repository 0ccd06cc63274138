"""Sequence evolution simulator (test/benchmark utility): evolves
protein sites down a tree under WAG(+Gamma), giving ground-truth
topologies for recovering-the-tree tests."""

from __future__ import annotations

import math

import numpy as np

from pepr_tpu.data.wag import WAG_FREQS, wag_eigensystem
from pepr_tpu.ops.gamma import discrete_gamma_rates
from pepr_tpu.tree.basic import Tree


def simulate_alignment(tree: Tree, length: int, rng,
                       alpha: float | None = None) -> tuple[np.ndarray, list[str]]:
    """Returns (codes (n_leaves, L) int8, taxa) evolved under WAG."""
    eig, u, ui = wag_eigensystem()
    if alpha is None:
        rates = np.ones(length)
    else:
        cats = discrete_gamma_rates(alpha, 4)
        rates = cats[rng.integers(0, 4, size=length)]

    root = tree.root
    states: dict[int, np.ndarray] = {
        root: rng.choice(20, size=length, p=WAG_FREQS / WAG_FREQS.sum())}
    order = tree.preorder()
    # cache P(t) per (blen) value x rate category
    for node in order:
        if node == root:
            continue
        t = tree.blen[node]
        t = 0.1 if (t is None or math.isnan(t)) else max(float(t), 1e-8)
        parent_state = states[tree.parent[node]]
        child = np.empty(length, dtype=np.int8)
        for r in np.unique(rates):
            p = u @ np.diag(np.exp(eig * t * r)) @ ui
            p = np.clip(p, 0, None)
            p /= p.sum(axis=1, keepdims=True)
            mask = rates == r
            ps = parent_state[mask]
            # vectorized categorical sampling via cdf + uniform
            cdf = np.cumsum(p[ps], axis=1)
            uvals = rng.random(len(ps))[:, None]
            child[mask] = (uvals > cdf).sum(axis=1).astype(np.int8)
        states[node] = child
    leaves = tree.leaves()
    taxa = [tree.labels[i] for i in leaves]
    codes = np.stack([states[i] for i in leaves]).astype(np.int8)
    return codes, taxa
