"""Erysipelotrichales golden-run conformance driver (README:12-20).

Runs the full pipeline in resumable foreground slices against the real
TPU.  Checkpoints live under conformance/ery_ckpt so progress survives
session restarts.  Usage:

    python conformance/run_ery.py [time_budget_seconds]

Exit codes: 0 = run complete (tree written), 3 = slice expired
(re-run to resume), 1 = error.
"""
from __future__ import annotations

import glob
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pepr_tpu.pipeline.checkpoint import Incomplete
from pepr_tpu.pipeline.pepr import PeprConfig, run_pepr

HERE = os.path.dirname(os.path.abspath(__file__))
EX = "/root/reference/examples/Erysipelotrichales"


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 540.0
    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr,
        format="%(asctime)s %(name)s %(message)s", datefmt="%H:%M:%S")
    # client-side persistent compile cache: the tunnel's server-side
    # cache expires after ~1h and a mid-recompile kill wedges the
    # backend; a local cache makes slices immune if the backend
    # supports serialized executables (harmless otherwise)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    genome_files = sorted(glob.glob(os.path.join(EX, "*.faa")))
    outgroup_files = sorted(glob.glob(os.path.join(EX, "outgroup", "*.faa")))
    if len(genome_files) != 10 or len(outgroup_files) != 4:
        print(f"dataset mismatch: {len(genome_files)} ingroup (want 10), "
              f"{len(outgroup_files)} outgroup (want 4) under {EX}",
              file=sys.stderr)
        return 1

    out_dir = os.path.join(HERE, "ery_out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = PeprConfig.default_track(
        run_name="erysipelotrichales",
        genome_files=genome_files,
        outgroup_files=outgroup_files,
        outgroup_count=2,
        out_dir=out_dir,
        checkpoint_dir=os.path.join(HERE, "ery_ckpt"),
        time_budget=budget,
    )
    t0 = time.time()
    try:
        res = run_pepr(cfg)
    except Incomplete as e:
        print(f"INCOMPLETE after {time.time()-t0:.0f}s at stage: {e}",
              flush=True)
        return 3
    print(f"COMPLETE in {time.time()-t0:.0f}s", flush=True)
    print("outgroups:", res.selected_outgroups, flush=True)
    print("tree:", res.newick, flush=True)
    for k, v in res.output_paths.items():
        print(f"  {k}: {v}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
