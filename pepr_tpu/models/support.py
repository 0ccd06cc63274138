"""Gene-wise jackknife branch supports.

Reference behavior: PhylogenomicPipeline2.buildConcatenatedTreeWith
GeneWiseJackKnifeSupport (PhylogenomicPipeline2.java:994-1126): the
full tree is built from the whole concatenated alignment (default ML);
each of `reps` (default 100) support trees is built with FastTree from
a random half of the gene families (RandomSetUtils.getRandomSet,
sampling without replacement); supports are bipartition match counts
(TreeSupportDecorator).

TPU-first: a jackknife replicate is just a 0/1 site-weight vector over
the same concatenated alignment — the likelihood kernel reweights
sites, so replicates reuse identical device shapes (no re-extraction,
no RAM throttling: PhylogenomicPipeline2.java:1011-1083's RAM models
are unnecessary under static HBM planning).
"""

from __future__ import annotations

import numpy as np

from pepr_tpu.models.concat import ConcatenatedAlignment
from pepr_tpu.models.treebuild import ml_tree, nj_tree
from pepr_tpu.ops.likelihood import WagModel
from pepr_tpu.tree import decorate_supports
from pepr_tpu.tree.basic import Tree


def jackknife_mask(cat: ConcatenatedAlignment, rep_idx: int, seed: int,
                   fraction: float = 0.5) -> np.ndarray:
    """(L,) float32 site-weight mask for one replicate: a random
    `fraction` of gene families sampled without replacement
    (PhylogenomicPipeline2.java:959-977: geneCount/2 genes).  Seeded
    per (seed, rep) so replicates are independent AND individually
    reproducible — resuming a checkpointed run regenerates identical
    masks."""
    rng = np.random.default_rng([seed, rep_idx])
    G = cat.n_genes
    k = max(int(G * fraction), 1)
    genes = rng.choice(G, size=k, replace=False)
    return cat.gene_column_mask(genes).astype(np.float32)


def jackknife_gene_masks(cat: ConcatenatedAlignment, reps: int, seed: int,
                         fraction: float = 0.5) -> np.ndarray:
    return np.stack([jackknife_mask(cat, r, seed, fraction)
                     for r in range(reps)])


def bootstrap_weights(length: int, rep_idx: int, seed: int) -> np.ndarray:
    """(L,) float32 multinomial column-resampling weights — the
    classic bootstrap (SequenceAlignment.java:994-1027 resamples
    columns with replacement; as site weights the resample is a pure
    reweighting of the same computation)."""
    rng = np.random.default_rng([seed, rep_idx, 7])
    counts = rng.multinomial(length, np.full(length, 1.0 / length))
    return counts.astype(np.float32)


def support_tree_single(cat: ConcatenatedAlignment, rep_idx: int,
                        seed: int, *, model: WagModel | None = None,
                        method: str = "fast_ml", fraction: float = 0.5,
                        nni_rounds: int = 2, bl_steps: int = 60,
                        resample: str = "jackknife_genes") -> Tree:
    """One support-tree replicate (a single unit of the reference's
    GeneSubsetTreeRunnable fan-out, PhylogenomicPipeline2.java:
    1546-1633).  `resample` picks gene-wise jackknife (the pipeline
    default) or classic site bootstrap."""
    if model is None:
        model = WagModel.create()
    if resample == "bootstrap_sites":
        w = bootstrap_weights(cat.length, rep_idx, seed)
    else:
        w = jackknife_mask(cat, rep_idx, seed, fraction)
    if method == "nj":
        return nj_tree(cat.mat, cat.taxa, site_weights=w)
    tree, _ = ml_tree(cat.mat, cat.taxa, model, site_weights=w,
                      nni_rounds=nni_rounds, bl_steps=bl_steps,
                      bl_refine_steps=max(bl_steps // 2, 20))
    return tree


def support_trees(cat: ConcatenatedAlignment, reps: int, seed, *,
                  model: WagModel | None = None, method: str = "fast_ml",
                  fraction: float = 0.5, nni_rounds: int = 2,
                  bl_steps: int = 60, store=None, deadline=None,
                  on_progress=None,
                  resample: str = "jackknife_genes") -> list[Tree]:
    """Build `reps` jackknife support trees, optionally checkpointing
    each replicate and stopping at a deadline (resumable)."""
    from pepr_tpu.tree import parse_newick, to_newick

    if isinstance(seed, np.random.Generator):  # legacy call style
        seed = int(seed.integers(1 << 31))
    if model is None:
        model = WagModel.create()
    out: list[Tree] = []
    for r in range(reps):
        key = f"support_{r:04d}"
        if store is not None and store.has(key):
            out.append(parse_newick(store.load(key)))
            continue
        if deadline is not None and deadline.expired:
            from pepr_tpu.pipeline.checkpoint import Incomplete
            raise Incomplete(f"support tree {r}/{reps}")
        tree = support_tree_single(cat, r, seed, model=model,
                                   method=method, fraction=fraction,
                                   nni_rounds=nni_rounds,
                                   bl_steps=bl_steps, resample=resample)
        if store is not None:
            store.save(key, to_newick(tree))
        if on_progress is not None:
            on_progress(r)
        out.append(tree)
    return out


def decorated_tree(full_tree: Tree, reps_trees: list[Tree]) -> Tree:
    """Support counts written onto the full tree
    (TreeSupportDecorator.java:86-163)."""
    return decorate_supports(full_tree, reps_trees)
