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


def jackknife_gene_masks(cat: ConcatenatedAlignment, reps: int, rng,
                         fraction: float = 0.5) -> np.ndarray:
    """(reps, L) float32 site-weight masks, each covering a random
    `fraction` of gene families sampled without replacement
    (PhylogenomicPipeline2.java:959-977: geneCount/2 genes)."""
    G = cat.n_genes
    k = max(int(G * fraction), 1)
    masks = np.zeros((reps, cat.length), dtype=np.float32)
    for r in range(reps):
        genes = rng.choice(G, size=k, replace=False)
        masks[r] = cat.gene_column_mask(genes).astype(np.float32)
    return masks


def support_trees(cat: ConcatenatedAlignment, reps: int, rng, *,
                  model: WagModel | None = None, method: str = "fast_ml",
                  fraction: float = 0.5, nni_rounds: int = 2,
                  bl_steps: int = 60) -> list[Tree]:
    """Build `reps` jackknife support trees (the FastTree fan-out of the
    reference, GeneSubsetTreeRunnable:1546-1633)."""
    if model is None:
        model = WagModel.create()
    masks = jackknife_gene_masks(cat, reps, rng, fraction)
    out: list[Tree] = []
    for r in range(reps):
        w = masks[r]
        if method == "nj":
            out.append(nj_tree(cat.mat, cat.taxa, site_weights=w))
            continue
        tree, _ = ml_tree(cat.mat, cat.taxa, model, site_weights=w,
                          nni_rounds=nni_rounds, bl_steps=bl_steps,
                          bl_refine_steps=max(bl_steps // 2, 20))
        out.append(tree)
    return out


def decorated_tree(full_tree: Tree, reps_trees: list[Tree]) -> Tree:
    """Support counts written onto the full tree
    (TreeSupportDecorator.java:86-163)."""
    return decorate_supports(full_tree, reps_trees)
