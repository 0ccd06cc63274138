"""Tree-builder comparison harness (TreeBuilderComparator.java:77-119
role): build a tree from the same alignment with each requested method,
report wall time, log-likelihood (under WAG+Gamma at the estimated
alpha), and pairwise RF distances.

Usage: python -m pepr_tpu.tools.treebuilder_compare aln.afa
           [-methods ml,fast_ml,nj,parsimony_bl]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from pepr_tpu.utils.cli import RunProperties


def compare_builders(mat: np.ndarray, taxa: list[str],
                     methods: list[str]) -> dict:
    """Returns {method: {seconds, log_likelihood, tree}} plus pairwise
    RF distances under key 'rf'."""
    from pepr_tpu.models.treebuild import (estimate_gamma_alpha, ml_tree,
                                           nj_start_tree, nj_tree,
                                           parsimony_tree, tree_to_arrays)
    from pepr_tpu.ops.likelihood import WagModel, loglik
    from pepr_tpu.tree import to_newick
    from pepr_tpu.tree.bipartition import rf_distance

    alpha = estimate_gamma_alpha(mat, taxa, nj_start_tree(mat, taxa))
    model = WagModel.create(alpha=alpha)
    out: dict = {"alpha": alpha}
    trees = {}
    for m in methods:
        t0 = time.time()
        if m == "nj":
            tree = nj_tree(mat, taxa)
        elif m == "fast_ml":
            tree, _ = ml_tree(mat, taxa, model, nni_rounds=2,
                              bl_steps=60, bl_refine_steps=30,
                              spr_rounds=0)
        elif m == "ml":
            tree, _ = ml_tree(mat, taxa, model)
        elif m in ("parsimony", "parsimony_bl"):
            tree, _ = parsimony_tree(mat, taxa, model=model,
                                     branch_lengths=m == "parsimony_bl")
        else:
            raise ValueError(f"unknown method {m!r}")
        secs = time.time() - t0
        arr = tree_to_arrays(tree, taxa)
        ll = float(loglik(mat, arr.children, arr.blen, model))
        trees[m] = tree
        out[m] = {"seconds": secs, "log_likelihood": ll,
                  "tree": to_newick(tree)}
    out["rf"] = {f"{a}-{b}": rf_distance(trees[a], trees[b])
                 for i, a in enumerate(methods)
                 for b in methods[i + 1:]}
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    files = [a for a in argv if not a.startswith("-")][:1]
    rp = RunProperties(argv)
    if not files:
        print(__doc__)
        return 2
    from pepr_tpu.io.alignio import parse_alignment
    a = parse_alignment(open(files[0]).read())
    methods = rp.get("methods", "fast_ml,nj").split(",")
    res = compare_builders(a.mat, a.taxa, methods)
    print(f"alpha\t{res['alpha']:.4f}")
    for m in methods:
        r = res[m]
        print(f"{m}\tseconds={r['seconds']:.2f}\t"
              f"ll={r['log_likelihood']:.2f}")
    for pair, rf in res["rf"].items():
        print(f"rf\t{pair}\t{rf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
