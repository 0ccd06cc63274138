"""Refinement loop semantics (PhylogeneticTreeRefiner parity)."""

import numpy as np
import pytest

from pepr_tpu.pipeline.refine import (next_refine_candidate, refine_tree)
from pepr_tpu.tree import parse_newick, rf_distance, to_newick
from pepr_tpu.tree.basic import ladderize, node_coordinates


def test_next_candidate_selection():
    # ABC clade has 100 support on its own edge but low internal support
    t = parse_newick("(((A:1,B:1)40:1,C:1)100:1,((D:1,E:1)100:1,F:1)100:1,G:1);")
    refined = set()
    cand = next_refine_candidate(t, 100, refined)
    assert cand is not None
    assert sorted(cand.ingroup) == ["A", "B", "C"]
    # outgroup = parent's other descendants
    assert set(cand.outgroup) - set(cand.ingroup)
    # same subset not offered twice
    cand2 = next_refine_candidate(t, 100, refined)
    assert cand2 is None or sorted(cand2.ingroup) != ["A", "B", "C"]


def test_no_candidate_when_all_supported():
    t = parse_newick("(((A:1,B:1)100:1,C:1)100:1,(D:1,E:1)100:1,F:1);")
    assert next_refine_candidate(t, 100, set()) is None


def test_skip_small_clades():
    t = parse_newick("(((A:1,B:1)40:1)100:1,(C:1,D:1)100:1,E:1);")
    # the low-support clade has only 2 leaves after collapse -> skip
    cand = next_refine_candidate(t, 100, set(), min_leaves=3)
    assert cand is None or len(cand.ingroup) >= 3


def test_refine_loop_grafts_and_terminates():
    start = parse_newick(
        "(((A:1,B:1)40:1,C:1)100:1,((D:1,E:1)100:1,F:1)100:1,G:1);")
    calls = []

    def run_subtree(ingroup, outgroup, round_idx):
        calls.append((sorted(ingroup), round_idx))
        # "refined" subtree resolves ABC differently, full support,
        # including one outgroup taxon for rooting
        og = outgroup[0]
        return parse_newick(
            f"((B:1,C:1)100:1,A:1,{og}:1);")

    out = refine_tree(start, ["G"], run_subtree, cutoff=100,
                      max_rounds=5)
    assert len(calls) == 1
    assert calls[0][0] == ["A", "B", "C"]
    assert sorted(out.leaf_labels()) == list("ABCDEFG")
    # the new (B,C) clade from the refined subtree is present
    from pepr_tpu.tree import bipartitions
    from pepr_tpu.tree.bipartition import taxon_index
    idx = taxon_index(sorted(out.leaf_labels()))
    bips = bipartitions(out, idx)
    bc = (1 << idx["B"]) | (1 << idx["C"])
    assert bc in bips


def test_ladderize_and_coords():
    t = parse_newick("((A:1,(B:1,C:1):1):1,D:1);")
    lad = ladderize(t)
    kids = lad.children[lad.root]
    counts = lad.descendant_leaf_counts()
    assert counts[kids[0]] <= counts[kids[1]]
    x, y = node_coordinates(t)
    leaves = t.leaves()
    assert sorted(y[leaves]) == [0, 1, 2, 3]
    assert x[t.root] == 0
