"""Command-line entry point with pepr-compatible flags.

Flag vocabulary follows the reference (HandyConstants.java:9-102 /
scripts/pepr.sh): -run_name, -genome_file, -outgroup, -outgroup_count,
-refine, -track, -conf, -support_reps, -tree_method, -mcl_inflation,
-min_taxa / -max_taxa / -min_taxa_multiplier, -unique_species.

Usage:
  python -m pepr_tpu.pipeline.cli -run_name X \
      -genome_file in/*.faa -outgroup og/*.faa -outgroup_count 2
"""

from __future__ import annotations

import sys

from pepr_tpu.pipeline.pepr import PeprConfig, run_pepr
from pepr_tpu.utils.cli import RunProperties, expand_paths


def config_from_args(argv: list[str]) -> PeprConfig:
    rp = RunProperties(argv)
    conf = rp.get("conf")
    if conf:
        rp = RunProperties.load(conf).merged_under(rp)

    track = rp.get("track", "default")
    cfg = PeprConfig.default_track() if track in ("default", "fast") \
        else PeprConfig()

    cfg.run_name = rp.get("run_name", cfg.run_name)
    cfg.genome_files = expand_paths(rp.values("genome_file"))
    cfg.outgroup_files = expand_paths(rp.values("outgroup"))
    cfg.outgroup_count = rp.get_int("outgroup_count", cfg.outgroup_count)
    cfg.out_dir = rp.get("out_dir", cfg.out_dir)
    if "checkpoint" in rp:
        cfg.checkpoint_dir = rp.get("checkpoint")
    if "time_budget" in rp:
        cfg.time_budget = rp.get_float("time_budget")
    cfg.refine = rp.get_bool("refine", cfg.refine)
    cfg.refine_cutoff = rp.get_float("refine_cutoff", cfg.refine_cutoff)
    if "min_taxa" in rp:
        cfg.min_taxa = rp.get_int("min_taxa")
    if "max_taxa" in rp:
        cfg.max_taxa = rp.get_int("max_taxa")
    cfg.min_taxa_multiplier = rp.get_float("min_taxa_multiplier",
                                           cfg.min_taxa_multiplier)
    if "target_ntax" in rp:
        cfg.target_sets = rp.get_int("target_ntax")

    hsm = rp.get("homology_search_method")
    if hsm and hsm.lower() not in ("blast", "blat", "false"):
        cfg.stage1.homology_file = hsm
    cfg.stage1.inflation = rp.get_float("mcl_inflation",
                                        cfg.stage1.inflation)
    cfg.stage1.inflation = rp.get_float("inflation", cfg.stage1.inflation)
    cfg.stage1.use_hmm = rp.get_bool("hmm", cfg.stage1.use_hmm)
    cfg.stage1.bidirectional = rp.get_bool("bidirectional",
                                           cfg.stage1.bidirectional)
    cfg.stage1.unique_species = rp.get_bool("unique_species",
                                            cfg.stage1.unique_species)
    cfg.stage2.support_reps = rp.get_int("support_reps",
                                         cfg.stage2.support_reps)
    method = rp.get("tree_method")
    if method:
        cfg.stage2.full_tree_method = \
            {"ml": "ml", "fasttree": "fast_ml", "nj": "nj",
             "fast_ml": "fast_ml"}.get(method.lower(), "ml")
    if track == "fast":
        cfg.stage2.full_tree_method = "fast_ml"
        cfg.stage2.support_reps = min(cfg.stage2.support_reps, 20)
    return cfg


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or "-h" in argv or "--help" in argv:
        print(__doc__)
        return 0
    cfg = config_from_args(argv)
    if not cfg.genome_files:
        print("error: -genome_file is required", file=sys.stderr)
        return 2
    result = run_pepr(cfg)
    print(result.newick)
    for suffix, path in result.output_paths.items():
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
