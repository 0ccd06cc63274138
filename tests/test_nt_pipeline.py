"""Nucleotide end-to-end pipeline test: synthetic NT genomes with a
known species tree through the blastn-equivalent homology search
(BlastRunner.java:603-706 role) and GTR+Gamma tree building
(FastTree -gtr -nt role, FastTreeRunner.java:67-77)."""

import numpy as np
import pytest

from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.pipeline.pepr import PeprConfig, run_pepr
from pepr_tpu.tree import parse_newick, rf_distance

SPECIES_NWK = ("(((N1:0.04,N2:0.04):0.05,(N3:0.04,N4:0.05):0.04):0.08,"
               "(N5:0.06,N6:0.05):0.07,OGN:0.25);")


def _evolve(seq, t, rng):
    """Jukes-Cantor-ish: each site substitutes with prob 1-exp(-t)."""
    out = seq.copy()
    m = rng.random(len(seq)) < (1.0 - np.exp(-t))
    out[m] = rng.integers(0, 4, m.sum())
    return out


def _simulate_nt(tree, L, rng):
    order = []  # preorder with parent state
    states = {}
    root = int(np.nonzero(tree.parent < 0)[0][0])
    states[root] = rng.integers(0, 4, L).astype(np.int8)
    stack = [root]
    leaves = {}
    while stack:
        v = stack.pop()
        for k in tree.children[v]:
            b = tree.blen[k]
            b = 0.05 if not np.isfinite(b) else float(b)
            states[k] = _evolve(states[v], b, rng)
            if tree.children[k]:
                stack.append(k)
            else:
                leaves[tree.labels[k]] = states[k]
    return leaves


@pytest.fixture(scope="module")
def nt_run(tmp_path_factory):
    rng = np.random.default_rng(99)
    species = parse_newick(SPECIES_NWK)
    taxa = sorted(species.leaf_labels())
    n_genes, L = 8, 192
    per_taxon = {t: [] for t in taxa}
    titles = {t: [] for t in taxa}
    for g in range(n_genes):
        leaves = _simulate_nt(species, L, rng)
        for t in taxa:
            per_taxon[t].append(leaves[t])
            titles[t].append(f"gene{g}_{t} family {g} [{t}]")
    genomes = {t: SequenceSet(t, titles[t], per_taxon[t]) for t in taxa}
    ingroup = [genomes[t] for t in ("N1", "N2", "N3", "N4", "N5", "N6")]
    pool = [genomes["OGN"]]
    out_dir = str(tmp_path_factory.mktemp("pepr_nt_out"))
    cfg = PeprConfig(run_name="ntsim", out_dir=out_dir, refine=False,
                     outgroup_count=1, alphabet="nt")
    cfg.min_taxa_multiplier = 0.8
    cfg.stage1.use_hmm = False  # the reference's blastn path is
    # protein-HMM-free; outgroup selection uses the SW scorer
    cfg.stage2.support_reps = 4
    cfg.stage2.full_tree_method = "ml"
    cfg.stage2.nni_rounds = 4
    cfg.stage2.bl_steps = 40
    result = run_pepr(cfg, genomes=ingroup, outgroup_pool=pool)
    return species, result


def test_nt_pipeline_recovers_species_tree(nt_run):
    species, result = nt_run
    assert rf_distance(result.tree, species) == 0


def test_nt_pipeline_uses_gtr(nt_run):
    _, result = nt_run
    assert result.stage2.model_name == "GTR"
    assert result.selected_outgroups == ["OGN"]
