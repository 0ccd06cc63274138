"""Validate muscle-style MSA refinement on the real ery families.

VERDICT r4 missing #2 asks for alignment-quality validation: this
re-aligns the Erysipelotrichales golden run's homolog-group sets
progressively (the r4 behavior), applies refine_families, and compares
(a) per-family sum-of-pairs scores, (b) Gblocks-trimmed column counts,
(c) the concatenated-matrix log-likelihood on the conformance topology
— before vs after refinement.  Writes msa_refine_eval.json.

Run: python conformance/msa_refine_eval.py  (CPU, ~20-40 min)
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from pepr_tpu.models.concat import concatenate
    from pepr_tpu.models.msa import (Alignment, align_families,
                                     refine_families, sp_score)
    from pepr_tpu.models.treebuild import optimize_branch_lengths
    from pepr_tpu.ops.likelihood import WagModel, tree_to_arrays
    from pepr_tpu.ops.trim import gblocks_mask
    from pepr_tpu.tree import parse_newick

    with open(os.path.join(HERE, "ery_ckpt", "stage1.pkl"), "rb") as fh:
        hg_sets, selected_outgroups, _ = pickle.load(fh)
    # same filter the golden run applied (default track: min_taxa =
    # ceil(0.99 * 12) = 12)
    kept = [s for s in hg_sets if len(set(s.taxa)) >= 12]
    print(f"{len(kept)} families (of {len(hg_sets)})", flush=True)

    t0 = time.time()
    mats = align_families([s.seqs for s in kept])
    print(f"progressive alignment in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    refined, n_imp = refine_families(mats, iters=2)
    print(f"refinement in {time.time()-t0:.0f}s; improved {n_imp}",
          flush=True)

    def build(mats_):
        alns = []
        cols = []
        for s, m in zip(kept, mats_):
            mask = gblocks_mask(m)
            cols.append(int(mask.sum()))
            if mask.sum():
                alns.append(Alignment(s.name, list(s.taxa),
                                      m[:, mask]))
        return concatenate(alns), cols

    cat0, cols0 = build(mats)
    cat1, cols1 = build(refined)
    sp0 = sum(sp_score(m) for m in mats)
    sp1 = sum(sp_score(m) for m in refined)
    print(f"SP score: {sp0:.0f} -> {sp1:.0f}", flush=True)
    print(f"trimmed columns: {sum(cols0)} -> {sum(cols1)}", flush=True)

    tree = parse_newick(open(os.path.join(
        HERE, "ery_out", "erysipelotrichales.nwk")).read())
    model = WagModel.create()
    lls = {}
    for tag, cat in (("progressive", cat0), ("refined", cat1)):
        arr = tree_to_arrays(tree, cat.taxa)
        _, ll = optimize_branch_lengths(
            np.asarray(cat.mat, np.int8), arr, model, steps=120)
        lls[tag] = float(ll)
        print(f"{tag}: L={cat.length}  LL={ll:.2f}", flush=True)

    out = {
        "families": len(kept),
        "families_improved": n_imp,
        "sp_before": sp0, "sp_after": sp1,
        "trimmed_cols_before": sum(cols0),
        "trimmed_cols_after": sum(cols1),
        "concat_ll_progressive": lls["progressive"],
        "concat_ll_refined": lls["refined"],
        "ll_delta": lls["refined"] - lls["progressive"],
    }
    with open(os.path.join(HERE, "msa_refine_eval.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote conformance/msa_refine_eval.json")


if __name__ == "__main__":
    main()
