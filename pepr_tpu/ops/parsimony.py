"""Fitch parsimony scoring on TPU.

The parsimony tree methods of the reference (RAxMLRunner.java:134-140
`-y`, and the parsimony_bl two-phase at :215-280) need per-topology
parsimony step counts.  State sets are 20-bit masks in int32 vectors
over sites; the postorder combine (intersect-else-union) runs as a
`lax.scan` mirroring the likelihood kernel's node walk, so candidate
topologies batch the same way.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pepr_tpu.alphabet import N_AA

ALL_STATES = (1 << N_AA) - 1


@jax.jit
def fitch_sites(codes: jax.Array, children: jax.Array) -> jax.Array:
    """Per-site minimum substitution counts (Fitch), (L,) int32.

    codes: (n_leaves, L) int8 (ambiguous codes >= 20 become full sets);
    children: (n_int, <=3) postorder child ids as in likelihood kernel.
    """
    n_leaves, L = codes.shape
    n_int = children.shape[0]
    n_nodes = n_leaves + n_int

    leaf_sets = jnp.where(codes < N_AA,
                          jnp.left_shift(jnp.int32(1),
                                         codes.astype(jnp.int32)),
                          jnp.int32(ALL_STATES))
    buf = jnp.zeros((n_nodes, L), jnp.int32)
    buf = buf.at[:n_leaves].set(leaf_sets)

    def step(carry, i):
        buf, steps = carry
        kids = children[i]

        def combine(acc_steps, k):
            acc, steps = acc_steps
            cid = kids[k]
            child = buf[jnp.maximum(cid, 0)]
            valid = cid >= 0
            inter = acc & child
            union = acc | child
            empty = inter == 0
            new_acc = jnp.where(empty, union, inter)
            new_steps = steps + jnp.where(empty, 1, 0)
            new_acc = jnp.where(valid, new_acc, acc)
            new_steps = jnp.where(valid, new_steps, steps)
            return (new_acc, new_steps)

        acc = buf[jnp.maximum(kids[0], 0)]
        site_steps = jnp.zeros(L, jnp.int32)
        acc, site_steps = combine((acc, site_steps), 1)
        acc, site_steps = combine((acc, site_steps), 2)
        buf = buf.at[n_leaves + i].set(acc)
        return (buf, steps + site_steps), None

    (buf, steps), _ = jax.lax.scan(
        step, (buf, jnp.zeros(L, jnp.int32)), jnp.arange(n_int))
    return steps


def fitch_score(codes, children, site_weights=None) -> float:
    steps = fitch_sites(jnp.asarray(codes), jnp.asarray(children))
    if site_weights is not None:
        return float((steps * jnp.asarray(site_weights)).sum())
    return float(steps.sum())


@jax.jit
def fitch_score_topologies(codes: jax.Array, children_batch: jax.Array,
                           weights: jax.Array) -> jax.Array:
    """Weighted Fitch scores for a batch of topologies (K,)."""

    def one(children):
        return (fitch_sites(codes, children) * weights).sum()

    return jax.lax.map(one, children_batch)


def fitch_numpy(codes: np.ndarray, children: np.ndarray) -> int:
    """Oracle."""
    n_leaves, L = codes.shape
    total = 0
    for s in range(L):
        sets = {}
        for i in range(n_leaves):
            c = codes[i, s]
            sets[i] = (1 << int(c)) if c < N_AA else ALL_STATES
        steps = 0
        for k in range(children.shape[0]):
            acc = None
            for cid in children[k]:
                if cid < 0:
                    continue
                child = sets[int(cid)]
                if acc is None:
                    acc = child
                elif acc & child:
                    acc &= child
                else:
                    acc |= child
                    steps += 1
            sets[n_leaves + k] = acc
        total += steps
    return total
