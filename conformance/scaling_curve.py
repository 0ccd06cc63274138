"""Multi-device scaling curve for the replicate BL-opt fan-out.

BASELINE's north star asks for >=90% scaling efficiency on the
likelihood/bootstrap fan-out at N>=2 hosts.  Real multi-chip hardware
is unavailable in this environment, so this measures the best
available proxy (VERDICT r4 missing #4): the PRODUCTION mesh path
(parallel.mesh.sharded_replicate_blopt — replicates over 'rep', sites
over 'site') on 1/2/4/8 virtual CPU devices
(xla_force_host_platform_device_count).

CAVEATS (stated in the output): virtual devices share one host's
cores, so contention depresses the curve relative to real chips, and
ICI latency/bandwidth are not modeled — this validates the sharding
DESIGN (no hidden serialization; collectives partition cleanly), not
interconnect performance.

Run: python conformance/scaling_curve.py   (writes scaling_r05.json)
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from pepr_tpu.models.concat import concatenate
    from pepr_tpu.models.msa import Alignment
    from pepr_tpu.models.support import jackknife_gene_masks
    from pepr_tpu.models.treebuild import nj_start_tree, tree_to_arrays
    from pepr_tpu.ops.likelihood import WagModel
    from pepr_tpu.parallel.mesh import (default_mesh,
                                        sharded_replicate_blopt)
    from pepr_tpu.tree import parse_newick, to_newick
    from pepr_tpu.utils.simulate import simulate_alignment

    rng = np.random.default_rng(11)
    tree = parse_newick(
        "(((A:0.1,B:0.12):0.08,(C:0.11,D:0.09):0.07):0.05,"
        "((E:0.1,F:0.13):0.09,(G:0.1,H:0.1):0.08):0.05);")
    genes = []
    for g in range(16):
        codes, taxa = simulate_alignment(tree, 1024, rng)
        genes.append(Alignment(f"g{g}", taxa, codes))
    cat = concatenate(genes)  # 8 taxa x 16384 sites
    reps = 16
    masks = jackknife_gene_masks(cat, reps, seed=5)
    model = WagModel.create()
    arrs = [tree_to_arrays(
        parse_newick(to_newick(nj_start_tree(cat.mat, cat.taxa,
                                             masks[r]))), cat.taxa)
            for r in range(reps)]
    children = np.stack([a.children for a in arrs])
    blens = np.stack([a.blen for a in arrs])
    steps = 20

    results = {}
    t1 = None
    for n in (1, 2, 4, 8):
        mesh = default_mesh(devices=jax.devices()[:n])
        # warm the compile out of the timing
        sharded_replicate_blopt(mesh, cat.mat, masks, children, blens,
                                model, steps=2)
        t0 = time.perf_counter()
        bl, ll = sharded_replicate_blopt(mesh, cat.mat, masks, children,
                                         blens, model, steps=steps)
        dt = time.perf_counter() - t0
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * 1)  # fixed total work: efficiency = t1/tN
        results[n] = {"seconds": round(dt, 2),
                      "speedup": round(t1 / dt, 3),
                      "efficiency_pct": round(100 * t1 / dt / n, 1),
                      "mesh": dict(mesh.shape)}
        print(f"devices={n} mesh={dict(mesh.shape)}: {dt:.2f}s  "
              f"speedup={t1/dt:.2f}x  eff={100*t1/dt/n:.0f}%",
              flush=True)
        assert np.isfinite(np.asarray(ll)).all()

    out = {
        "workload": f"sharded_replicate_blopt: {reps} replicates x "
                    f"{cat.length} sites x 8 taxa x {steps} adam steps",
        "platform": "virtual CPU devices "
                    "(xla_force_host_platform_device_count)",
        "caveat": "virtual devices share one host's cores and ICI is "
                  "not modeled; this validates the sharding design, "
                  "not interconnect performance",
        "curve": results,
    }
    with open(os.path.join(HERE, "scaling_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote conformance/scaling_r05.json")


if __name__ == "__main__":
    main()
