"""Tree comparison CLI (TreeComparison.java:30-126 role).

Usage: python -m pepr_tpu.tools.tree_comparison t1.nwk t2.nwk
           [-align aln.phy -sitelh out.sitelh]
Prints RF distance and (normalized) branch-score distance; with an
alignment, writes per-site log-likelihoods in Tree-Puzzle format (the
CONSEL/AU-test input the reference produces via raxml -f g)."""

from __future__ import annotations

import sys

from pepr_tpu.models.treecompare import (compare_trees,
                                         per_site_log_likelihoods,
                                         sitelh_text)
from pepr_tpu.tree import parse_newick
from pepr_tpu.utils.cli import RunProperties


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    files = [a for a in argv if not a.startswith("-")][:2]
    rp = RunProperties(argv)
    if len(files) < 2:
        print(__doc__)
        return 2
    t1 = parse_newick(open(files[0]).read())
    t2 = parse_newick(open(files[1]).read())
    result = compare_trees(t1, t2)
    for k, v in result.items():
        print(f"{k}\t{v}")
    aln = rp.get("align")
    if aln:
        from pepr_tpu.io.alignio import parse_alignment
        a = parse_alignment(open(aln).read())
        lls = per_site_log_likelihoods([t1, t2], a.mat, a.taxa)
        out = rp.get("sitelh", "trees.sitelh")
        with open(out, "w") as fh:
            fh.write(sitelh_text(lls))
        print(f"per-site log-likelihoods written to {out}")
        print(f"total_ll_tree1\t{lls[0].sum():.4f}")
        print(f"total_ll_tree2\t{lls[1].sum():.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
