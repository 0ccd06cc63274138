"""End-to-end pipeline test on simulated genomes with a known species
tree — the synthetic analog of the reference's golden-output example
runs (README:12-33)."""

import numpy as np
import pytest

from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.pipeline.pepr import PeprConfig, run_pepr
from pepr_tpu.pipeline.refine import graft_refined_subtree
from pepr_tpu.tree import parse_newick, rf_distance, to_newick
from pepr_tpu.utils.simulate import simulate_alignment

SPECIES_NWK = ("(((S1:0.05,S2:0.05):0.06,(S3:0.05,S4:0.07):0.05):0.1,"
               "(S5:0.08,S6:0.06):0.09,(OG1:0.3,OG2:0.35):0.2);")


def _make_genomes(rng, n_genes=12, gene_len=120):
    species = parse_newick(SPECIES_NWK)
    taxa = sorted(species.leaf_labels())
    per_taxon: dict[str, list] = {t: [] for t in taxa}
    titles: dict[str, list] = {t: [] for t in taxa}
    for g in range(n_genes):
        codes, sim_taxa = simulate_alignment(species, gene_len, rng,
                                             alpha=None)
        for row, t in enumerate(sim_taxa):
            per_taxon[t].append(codes[row])
            titles[t].append(f"gene{g}_{t} family {g} [{t}]")
    genomes = {t: SequenceSet(t, titles[t], per_taxon[t]) for t in taxa}
    return species, genomes


@pytest.fixture(scope="module")
def sim_run(tmp_path_factory):
    rng = np.random.default_rng(2024)
    species, genomes = _make_genomes(rng)
    ingroup = [genomes[t] for t in ("S1", "S2", "S3", "S4", "S5", "S6")]
    pool = [genomes["OG1"], genomes["OG2"]]
    out_dir = str(tmp_path_factory.mktemp("pepr_out"))
    cfg = PeprConfig(run_name="sim", out_dir=out_dir, refine=False,
                     outgroup_count=2)
    cfg.min_taxa_multiplier = 0.8
    # 120-residue synthetic genes can't reach the production 144-bit
    # (-E 1e-40 equivalent) cutoff under entropy weighting — real
    # hmmsearch at the reference's E-value would drop them too.  The
    # pipeline machinery is under test here, not the calibration.
    cfg.stage1.hmm_min_bits = 40.0
    cfg.stage2.support_reps = 10
    cfg.stage2.full_tree_method = "ml"
    cfg.stage2.nni_rounds = 4
    cfg.stage2.bl_steps = 80
    result = run_pepr(cfg, genomes=ingroup, outgroup_pool=pool)
    return species, result


def test_pipeline_recovers_species_tree(sim_run):
    species, result = sim_run
    got = result.tree
    # compare on the ingroup + selected outgroups (OG taxa included)
    assert rf_distance(got, species) == 0


def test_pipeline_selects_outgroups(sim_run):
    _, result = sim_run
    assert set(result.selected_outgroups) == {"OG1", "OG2"}


def test_pipeline_supports_high(sim_run):
    _, result = sim_run
    sups = [s for s in result.tree.support if not np.isnan(s)]
    assert len(sups) > 0
    assert np.mean(sups) >= 8  # of 10 reps


def test_pipeline_outputs_written(sim_run):
    _, result = sim_run
    paths = result.output_paths
    assert set(paths) >= {"_final_rooted.nwk", "_final_rooted.json",
                          ".nwk", ".sup", ".hs", ".clp", ".report.xml"}
    nwk = open(paths["_final_rooted.nwk"]).read()
    assert nwk.strip().endswith(";")
    xml = open(paths[".report.xml"]).read()
    assert "<pepr_run" in xml and "<gene_count>" in xml
    sup = open(paths[".sup"]).read().strip().split("\n")
    assert len(sup) == 10
    hs = open(paths[".hs"]).read()
    assert hs.count("\n") >= 10


def test_pipeline_rooted_by_outgroup(sim_run):
    _, result = sim_run
    kids = result.tree.children[result.tree.root]
    sides = [sorted(result.tree.labels[i]
                    for i in result.tree.descendant_leaves(k))
             for k in kids]
    assert ["OG1", "OG2"] in sides


def test_graft_refined_subtree():
    big = parse_newick("(((A:1,B:1)90:1,(C:1,D:1)50:1)100:1,"
                       "(E:1,F:1)100:1);")
    # refined version of the ABCD clade, rooted by outgroup E
    refined = parse_newick("(((A:1,C:1):1,(B:1,D:1):1):1,E:1);")
    grafted = graft_refined_subtree(big, refined, ["E"])
    assert sorted(grafted.leaf_labels()) == ["A", "B", "C", "D", "E", "F"]
    want = parse_newick("(((A:1,C:1):1,(B:1,D:1):1):1,(E:1,F:1):1);")
    assert rf_distance(grafted, want) == 0
