"""Gene-congruence filter.

Reference behavior (PhylogenomicPipeline2.java:429-511): pool the
per-column character bipartitions of all gene alignments, keep the
top 4N most frequent bipartitions, score each gene by the mean
conflict cost of its own column bipartitions against that top set
(BipartitionSet.java:577-605: count mass of incompatible
bipartitions), and drop the worst `drop_fraction` (10%) of genes.
"""

from __future__ import annotations

import numpy as np

from pepr_tpu.alphabet import N_AA
from pepr_tpu.models.msa import Alignment
from pepr_tpu.tree.bipartition import canonical, compatible


def column_bipartitions(aln: Alignment, t_index: dict[str, int],
                        min_side: int = 2) -> list[int]:
    """Character-class bipartitions of every column
    (SequenceAlignment.java:808-902): each residue class with at least
    `min_side` members on both sides defines a taxon bipartition."""
    n_tot = len(t_index)
    full = (1 << n_tot) - 1
    rows = [t_index.get(t) for t in aln.taxa]
    out: list[int] = []
    mat = aln.mat
    for col in range(aln.length):
        classes: dict[int, int] = {}
        for r, ti in enumerate(rows):
            if ti is None:
                continue
            c = int(mat[r, col])
            if c >= N_AA:
                continue
            classes[c] = classes.get(c, 0) | (1 << ti)
        for mask in classes.values():
            size = bin(mask).count("1")
            if min_side <= size <= n_tot - min_side:
                out.append(canonical(mask, full))
    return out


def congruence_scores(alignments: list[Alignment],
                      top_multiplier: int = 4) -> np.ndarray:
    """Per-gene mean conflict cost (higher = less congruent)."""
    taxa: dict[str, None] = {}
    for a in alignments:
        for t in a.taxa:
            taxa.setdefault(t, None)
    t_index = {t: i for i, t in enumerate(taxa)}
    full = (1 << len(t_index)) - 1

    gene_bips = [column_bipartitions(a, t_index) for a in alignments]
    counts: dict[int, int] = {}
    for bips in gene_bips:
        for b in bips:
            counts[b] = counts.get(b, 0) + 1
    top_n = top_multiplier * len(t_index)
    top = dict(sorted(counts.items(), key=lambda kv: -kv[1])[:top_n])
    total = sum(top.values()) or 1

    # cache conflict cost per distinct bipartition
    cost_cache: dict[int, float] = {}

    def cost(b: int) -> float:
        got = cost_cache.get(b)
        if got is None:
            bad = sum(c for tb, c in top.items()
                      if not compatible(b, tb, full))
            got = bad / total
            cost_cache[b] = got
        return got

    scores = np.zeros(len(alignments))
    for g, bips in enumerate(gene_bips):
        if bips:
            scores[g] = float(np.mean([cost(b) for b in bips]))
    return scores


def filter_congruent(alignments: list[Alignment],
                     drop_fraction: float = 0.1,
                     top_multiplier: int = 4) -> list[Alignment]:
    """Drop the `drop_fraction` least congruent genes."""
    if len(alignments) < 3 or drop_fraction <= 0:
        return alignments
    scores = congruence_scores(alignments, top_multiplier)
    n_drop = int(len(alignments) * drop_fraction)
    if n_drop == 0:
        return alignments
    worst = set(np.argsort(-scores)[:n_drop])
    return [a for g, a in enumerate(alignments) if g not in worst]
