"""Checkpoint/resume: interrupted runs resume deterministically."""

import numpy as np
import pytest

from pepr_tpu.pipeline.checkpoint import (CheckpointStore, Deadline,
                                          Incomplete)
from pepr_tpu.pipeline.pepr import PeprConfig, run_pepr
from pepr_tpu.tree import rf_distance
from tests.test_pipeline_e2e import _make_genomes


def _cfg(out_dir, ckpt=None, budget=None):
    cfg = PeprConfig(run_name="ck", out_dir=out_dir, refine=False,
                     outgroup_count=2, checkpoint_dir=ckpt,
                     time_budget=budget)
    cfg.min_taxa_multiplier = 0.8
    cfg.stage2.support_reps = 4
    cfg.stage2.full_tree_method = "fast_ml"
    cfg.stage2.nni_rounds = 2
    cfg.stage2.bl_steps = 40
    return cfg


def test_store_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "s"))
    assert not store.has("x")
    store.save("x", {"a": np.arange(3)})
    assert store.has("x")
    assert list(store.load("x")["a"]) == [0, 1, 2]
    calls = []
    got = store.cached("x", lambda: calls.append(1) or "nope")
    assert calls == [] and isinstance(got, dict)


def test_deadline():
    d = Deadline(None)
    assert not d.expired
    d2 = Deadline(0.0)
    assert d2.expired


def test_interrupt_and_resume(tmp_path):
    rng = np.random.default_rng(77)
    species, genomes = _make_genomes(rng, n_genes=8, gene_len=80)
    ingroup = [genomes[t] for t in ("S1", "S2", "S3", "S4", "S5", "S6")]
    pool = [genomes["OG1"], genomes["OG2"]]
    ck = str(tmp_path / "ckpt")

    # run with an impossibly small budget: must raise Incomplete but
    # leave resumable state
    with pytest.raises(Incomplete):
        run_pepr(_cfg(str(tmp_path), ck, budget=0.0),
                 genomes=ingroup, outgroup_pool=pool, write_files=False)

    # resume without budget: completes using cached stage results
    res = run_pepr(_cfg(str(tmp_path), ck), genomes=ingroup,
                   outgroup_pool=pool, write_files=False)

    # uncheckpointed reference run must agree (determinism)
    res2 = run_pepr(_cfg(str(tmp_path)), genomes=ingroup,
                    outgroup_pool=pool, write_files=False)
    assert rf_distance(res.tree, res2.tree) == 0
    sup1 = sorted(x for x in res.tree.support if not np.isnan(x))
    sup2 = sorted(x for x in res2.tree.support if not np.isnan(x))
    assert sup1 == sup2


def test_support_reps_resume_partial(tmp_path):
    """Support replicates checkpoint one by one and resume mid-list."""
    rng = np.random.default_rng(78)
    species, genomes = _make_genomes(rng, n_genes=8, gene_len=80)
    ingroup = [genomes[t] for t in ("S1", "S2", "S3", "S4", "S5", "S6")]
    pool = [genomes["OG1"]]
    ck = str(tmp_path / "ck2")

    cfg = _cfg(str(tmp_path), ck)
    res = run_pepr(cfg, genomes=ingroup, outgroup_pool=pool,
                   write_files=False)
    store = CheckpointStore(ck)
    assert store.has("support_0000") and store.has("support_0003")
    assert store.has("stage1") and store.has("full_tree")
