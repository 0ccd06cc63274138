"""Stage 2: homolog groups -> alignments -> concatenation -> trees.

The orchestration replacing PhylogenomicPipeline2
(PhylogenomicPipeline2.java:102-427): filter sets by taxa counts,
align (batched progressive MSA), trim (Gblocks semantics), concatenate
over the taxon union, build the full tree (default ML) and gene-wise
jackknife support trees, decorate supports.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.models.concat import ConcatenatedAlignment, concatenate
from pepr_tpu.models.msa import Alignment
from pepr_tpu.models.support import decorated_tree, support_trees
from pepr_tpu.models.treebuild import ml_tree, nj_tree
from pepr_tpu.ops.likelihood import WagModel
from pepr_tpu.ops.trim import gblocks_mask
from pepr_tpu.tree import to_newick
from pepr_tpu.tree.basic import Tree


@dataclass
class Stage2Config:
    min_taxa: int = 4
    max_taxa: int = 10 ** 9
    target_sets: int | None = None  # cap on gene families (largest kept)
    representative_only: bool = False  # one member per taxon per set
    trim: bool = True
    congruence_filter: bool = False
    congruence_drop: float = 0.1
    full_tree_method: str = "ml"  # ml | fast_ml | nj | parsimony[_bl]
    support_method: str = "fast_ml"  # FastTree-equivalent
    support_reps: int = 100
    jackknife_fraction: float = 0.5
    gamma_alpha: float = 1.0
    # ML estimate of the Gamma shape on the NJ starting topology before
    # tree search (RAxML optimizes alpha inside -f d/-f e,
    # RAxMLRunner.java:79-280); gamma_alpha is the fallback/fixed value
    estimate_alpha: bool = True
    # matrix evaluation (PhylogenomicPipeline2.java:252-295): score a
    # parsimony tree under candidate substitution models, use the best
    # for the full tree + supports.  False (reference default), True
    # (registered model list), or an explicit list of model names.
    matrix_evaluation: bool | list = False
    # muscle-style iterative MSA refinement passes (re-estimate the
    # guide tree from the current alignment, re-align, keep on
    # improved sum-of-pairs score) — the reference's muscle runs its
    # refinement by default (MultipleSequenceAligner.java:90-141)
    msa_refine_iters: int = 1
    nni_rounds: int = 8
    bl_steps: int = 200
    # support replicates play the reference's FastTree role (fast
    # approximate ML, FastTreeRunner.java:67-86) — they get a lighter
    # branch-length budget than the full tree's raxml-role bl_steps
    support_bl_steps: int = 60
    seed: int = 12345
    # "nt": align with blastn-style scores, build trees under GTR+Gamma
    # (FastTree -gtr -nt role).  repr=False: see Stage1Config.alphabet.
    alphabet: str = field(default="aa", repr=False)


@dataclass
class Stage2Result:
    tree: Tree  # support-decorated full tree
    full_tree: Tree
    support_trees: list[Tree]
    concat: ConcatenatedAlignment
    alignments: list[Alignment]
    log_likelihood: float | None = None
    gamma_alpha: float = 1.0
    model_name: str = "WAG"
    timings: dict = field(default_factory=dict)

    @property
    def newick(self) -> str:
        return to_newick(self.tree)


def filter_sets(sets: list[SequenceSet], cfg: Stage2Config) -> list[SequenceSet]:
    """Taxon-count and representative filters
    (SequenceSetProviderImpl.java:115-140, 223-247, 295-329)."""
    out = []
    for s in sets:
        taxa = s.distinct_taxa()
        if not (cfg.min_taxa <= len(taxa) <= cfg.max_taxa):
            continue
        if cfg.representative_only and len(taxa) != len(s):
            # keep first member per taxon
            seen: set[str] = set()
            keep = []
            for i, t in enumerate(s.taxa):
                if t not in seen:
                    seen.add(t)
                    keep.append(i)
            s = s.subset(keep)
        out.append(s)
    out.sort(key=len, reverse=True)
    if cfg.target_sets is not None:
        out = out[: cfg.target_sets]
    return out


def run_stage2(sets: list[SequenceSet],
               cfg: Stage2Config | None = None, store=None,
               deadline=None) -> Stage2Result:
    import logging
    import time

    from pepr_tpu.pipeline.checkpoint import Incomplete
    log = logging.getLogger("pepr_tpu")
    cfg = cfg or Stage2Config()
    timings: dict = {}

    t0 = time.time()
    kept = filter_sets(sets, cfg)
    if not kept:
        raise ValueError("no homolog groups survive the taxa filters")

    def _align_and_trim():
        from pepr_tpu.models.msa import align_families_chunked
        nt_kw = {}
        if cfg.alphabet == "nt":
            from pepr_tpu.data.nt_scores import (NT_GAP_EXTEND,
                                                 NT_GAP_OPEN, nt_core)
            nt_kw = dict(core=nt_core(), gap_open=float(NT_GAP_OPEN),
                         gap_extend=float(NT_GAP_EXTEND))
        mats = align_families_chunked(
            [s.seqs for s in kept], store=store, deadline=deadline,
            ckpt_key="s2_align_chunk", **nt_kw)
        if cfg.msa_refine_iters > 0:
            from pepr_tpu.models.msa import refine_families
            mats, n_imp = refine_families(mats,
                                          iters=cfg.msa_refine_iters,
                                          **nt_kw)
            log.info("stage2: MSA refinement improved %d/%d families",
                     n_imp, len(mats))
        alignments = [Alignment(s.name, list(s.taxa), m,
                                titles=list(s.titles))
                      for s, m in zip(kept, mats)]
        if cfg.trim:
            trimmed = []
            for a in alignments:
                mask = gblocks_mask(a.mat)
                if mask.sum() == 0:
                    continue
                trimmed.append(Alignment(a.name, a.taxa, a.mat[:, mask],
                                         titles=a.titles))
            if trimmed:
                alignments = trimmed
        return alignments

    if store is not None:
        alignments = store.cached("alignments", _align_and_trim)
    else:
        alignments = _align_and_trim()
    timings["align"] = time.time() - t0
    log.info("stage2: aligned %d families in %.1fs", len(alignments),
             timings["align"])
    if deadline is not None and deadline.expired:
        raise Incomplete("alignment")

    if cfg.congruence_filter:
        from pepr_tpu.models.congruence import filter_congruent
        t0 = time.time()
        alignments = filter_congruent(alignments,
                                      drop_fraction=cfg.congruence_drop)
        timings["congruence_filter"] = time.time() - t0

    t0 = time.time()
    cat = concatenate(alignments)
    timings["concat"] = time.time() - t0
    log.info("stage2: concatenated %d genes, %d columns", cat.n_genes,
             cat.length)

    alpha = cfg.gamma_alpha
    if cfg.estimate_alpha and cfg.full_tree_method not in ("nj",):
        from pepr_tpu.models.treebuild import (estimate_gamma_alpha,
                                               nj_start_tree)
        t0 = time.time()

        def _alpha():
            start = nj_start_tree(cat.mat, cat.taxa)
            return estimate_gamma_alpha(cat.mat, cat.taxa, start)

        alpha = store.cached("gamma_alpha", _alpha) if store is not None \
            else _alpha()
        timings["alpha_estimate"] = time.time() - t0
        log.info("stage2: gamma alpha = %.3f (%.1fs)", alpha,
                 timings["alpha_estimate"])
        if deadline is not None and deadline.expired:
            raise Incomplete("alpha estimation")

    model_name = "WAG"
    if cfg.matrix_evaluation:
        from pepr_tpu.models.treebuild import evaluate_substitution_models
        t0 = time.time()
        names = cfg.matrix_evaluation \
            if isinstance(cfg.matrix_evaluation, list) else None

        def _matrix_eval():
            return evaluate_substitution_models(cat.mat, cat.taxa, names,
                                                alpha=alpha)

        model_name, _scores = store.cached("matrix_eval", _matrix_eval) \
            if store is not None else _matrix_eval()
        timings["matrix_evaluation"] = time.time() - t0
        log.info("stage2: matrix evaluation chose %s (%.1fs)",
                 model_name, timings["matrix_evaluation"])
        if deadline is not None and deadline.expired:
            raise Incomplete("matrix evaluation")

    if cfg.alphabet == "nt":
        # GTR+Gamma with empirical base frequencies (FastTree -gtr -nt
        # role, FastTreeRunner.java:67-77)
        model_name = "GTR"
        from pepr_tpu.alphabet import N_NT
        counts = np.bincount(cat.mat[cat.mat < N_NT].ravel(),
                             minlength=N_NT).astype(np.float64)
        model = WagModel.gtr_nt(freqs=counts / max(counts.sum(), 1.0),
                                alpha=alpha)
    elif model_name == "WAG":
        model = WagModel.create(alpha=alpha)
    else:
        from pepr_tpu.models.treebuild import empirical_aa_freqs
        model = WagModel.named(model_name, alpha=alpha,
                               empirical_freqs=empirical_aa_freqs(cat.mat))
    t0 = time.time()

    def _full_tree():
        from pepr_tpu.tree import to_newick
        if cfg.full_tree_method == "nj":
            return to_newick(nj_tree(cat.mat, cat.taxa)), None
        if cfg.full_tree_method in ("parsimony", "parsimony_bl"):
            from pepr_tpu.models.treebuild import parsimony_tree
            t, _ = parsimony_tree(
                cat.mat, cat.taxa, model=model,
                branch_lengths=cfg.full_tree_method == "parsimony_bl",
                nni_rounds=cfg.nni_rounds, bl_steps=cfg.bl_steps)
            return to_newick(t), None
        fast = cfg.full_tree_method == "fast_ml"
        t, ll = ml_tree(
            cat.mat, cat.taxa, model,
            nni_rounds=(2 if fast else cfg.nni_rounds),
            bl_steps=(60 if fast else cfg.bl_steps),
            bl_refine_steps=(30 if fast else max(cfg.bl_steps // 3, 40)),
            spr_rounds=(1 if fast else 2),
            store=store, deadline=deadline,
            ckpt_key="full_tree_state")
        return to_newick(t), ll

    from pepr_tpu.tree import parse_newick
    if store is not None:
        full_nwk, ll = store.cached("full_tree", _full_tree)
    else:
        full_nwk, ll = _full_tree()
    full = parse_newick(full_nwk)
    timings["full_tree"] = time.time() - t0
    log.info("stage2: full tree (%s) in %.1fs", cfg.full_tree_method,
             timings["full_tree"])
    if deadline is not None and deadline.expired:
        from pepr_tpu.pipeline.checkpoint import Incomplete
        raise Incomplete("full tree")

    t0 = time.time()
    reps = support_trees(
        cat, cfg.support_reps, cfg.seed, model=model,
        method=cfg.support_method, fraction=cfg.jackknife_fraction,
        nni_rounds=cfg.nni_rounds, bl_steps=cfg.support_bl_steps,
        store=store, deadline=deadline,
        on_progress=lambda r: log.info("stage2: support tree %d done", r))
    timings["support_trees"] = time.time() - t0
    log.info("stage2: %d support trees in %.1fs", len(reps),
             timings["support_trees"])

    dec = decorated_tree(full, reps)
    return Stage2Result(dec, full, reps, cat, alignments, ll, alpha,
                        model_name, timings)
