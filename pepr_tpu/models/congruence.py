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
    `min_side` members on both sides defines a taxon bipartition.

    Vectorized: per residue class, taxon membership over all columns is
    one (n_taxa, n_rows) @ (n_rows, L) contraction; only the qualifying
    (class, column) pairs are materialized as python-int bitsets (the
    per-row-per-column loop died at BASELINE.json scale)."""
    n_tot = len(t_index)
    full = (1 << n_tot) - 1
    rows = np.array([t_index.get(t, -1) for t in aln.taxa], dtype=np.int64)
    keep = rows >= 0
    mat = aln.mat[keep]
    ti = rows[keep]
    if mat.size == 0:
        return []
    onehot_t = np.zeros((n_tot, mat.shape[0]), dtype=np.uint8)
    onehot_t[ti, np.arange(mat.shape[0])] = 1
    out: list[int] = []
    for a in range(N_AA):
        hit = (mat == a)
        if not hit.any():
            continue
        memb = (onehot_t @ hit.astype(np.uint8)) > 0  # (n_tot, L)
        sizes = memb.sum(axis=0)
        for col in np.nonzero((sizes >= min_side)
                              & (sizes <= n_tot - min_side))[0]:
            mask = int.from_bytes(
                np.packbits(memb[:, col], bitorder="little").tobytes(),
                "little")
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
