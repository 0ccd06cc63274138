"""BASELINE config-3 scale run: 50 genomes, ~1000 families, 100
jackknife support replicates, refinement enabled.

First evidence the framework scales beyond the 14-genome bundled
examples (VERDICT r4 missing #3).  Runs the full pipeline in
resumable foreground slices against the real TPU (the tunneled
backend kills multi-minute device calls; see CLAUDE.md), checkpoints
under conformance/scale50_ckpt, and prints per-stage wall times on
completion.  Usage:

    python conformance/gen50.py          # once: generate the dataset
    python conformance/run_scale50.py [time_budget_seconds]

Exit codes: 0 = complete, 3 = slice expired (re-run to resume),
1 = error.
"""
from __future__ import annotations

import glob
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pepr_tpu.pipeline.checkpoint import Incomplete
from pepr_tpu.pipeline.pepr import PeprConfig, run_pepr

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "scale50_data")


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 520.0
    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr,
        format="%(asctime)s %(name)s %(message)s", datefmt="%H:%M:%S")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    genome_files = sorted(glob.glob(os.path.join(DATA, "genomes",
                                                 "*.faa")))
    outgroup_files = sorted(glob.glob(os.path.join(DATA, "outgroup",
                                                   "*.faa")))
    if len(genome_files) != 50 or len(outgroup_files) != 3:
        print(f"dataset mismatch ({len(genome_files)}/"
              f"{len(outgroup_files)}); run conformance/gen50.py first",
              file=sys.stderr)
        return 1

    out_dir = os.path.join(HERE, "scale50_out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = PeprConfig.default_track(
        run_name="scale50",
        genome_files=genome_files,
        outgroup_files=outgroup_files,
        outgroup_count=2,
        out_dir=out_dir,
        checkpoint_dir=os.path.join(HERE, "scale50_ckpt"),
        time_budget=budget,
    )
    # the generator's ~90% per-taxon family presence means the default
    # min_taxa_multiplier=0.99 (ceil -> all 52 taxa) keeps only ~60
    # families; 44 (~85%) admits the ~1000-family matrix the BASELINE
    # config names
    cfg.min_taxa = 44
    # support replicates are the FastTree fast-approximate role; 40
    # adam steps keeps each resumable BL-opt block inside a tunnel
    # slice at this tree size (the full tree keeps the default 200)
    cfg.stage2.support_bl_steps = 40
    t0 = time.time()
    try:
        res = run_pepr(cfg)
    except Incomplete as e:
        print(f"INCOMPLETE after {time.time()-t0:.0f}s at stage: {e}",
              flush=True)
        return 3
    print(f"COMPLETE in {time.time()-t0:.0f}s (this slice)", flush=True)
    print("outgroups:", res.selected_outgroups, flush=True)
    print("tree:", res.newick[:400], flush=True)
    for k, v in res.output_paths.items():
        print(f"  {k}: {v}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
