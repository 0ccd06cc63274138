"""Multi-device scaling curve for the replicate BL-opt fan-out.

BASELINE's north star asks for >=90% scaling efficiency on the
likelihood/bootstrap fan-out at N>=2 hosts.  Real multi-chip hardware
is unavailable in this environment, so this measures the best
available proxy (VERDICT r4 missing #4) on the PRODUCTION mesh path
(parallel.mesh.sharded_replicate_blopt — replicates over 'rep', sites
over 'site') with virtual CPU devices
(xla_force_host_platform_device_count).

This host has only 2 physical cores, which forces two measurement
regimes (a first, naive fixed-host run showed why: with 8 virtual
devices time-slicing 2 cores, the "curve" measures oversubscription,
not sharding):

  * pinned legs (the meaningful proxy): `taskset` restricts the
    process to N cores for the N-device leg, so each virtual device
    approximates one single-core host.  Efficiency = t(1dev,1core) /
    (N * t(Ndev,Ncores)) is a true scaling number for the sharded
    program, with shared-memory collectives standing in for ICI.
    Capped at N=2 by the machine.
  * oversubscribed legs (4, 8 devices on 2 cores): reported only as
    fixed-host overhead factors t(N)/t(1); ideal is 1.0 since total
    compute hardware is constant.  These validate that the partitioned
    program compiles and executes (no hidden serialization) — they are
    NOT efficiency numbers.

ICI latency/bandwidth are not modeled in either regime.

Run: python conformance/scaling_curve.py        (orchestrates all legs,
                                                 writes scaling_r05.json)
     python conformance/scaling_curve.py <n>    (one leg, prints JSON)
"""

import json
import os
import subprocess
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))


def run_leg(n: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pepr_tpu.models.concat import concatenate
    from pepr_tpu.models.msa import Alignment
    from pepr_tpu.models.support import jackknife_gene_masks
    from pepr_tpu.models.treebuild import nj_start_tree, tree_to_arrays
    from pepr_tpu.ops.likelihood import WagModel
    from pepr_tpu.parallel.mesh import default_mesh, sharded_replicate_blopt
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

    mesh = default_mesh(devices=jax.devices()[:n])
    # warm the compile out of the timing
    sharded_replicate_blopt(mesh, cat.mat, masks, children, blens,
                            model, steps=2)
    t0 = time.perf_counter()
    bl, ll = sharded_replicate_blopt(mesh, cat.mat, masks, children,
                                     blens, model, steps=steps)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(ll)).all()
    print("LEG " + json.dumps({"n": n, "seconds": round(dt, 2),
                               "mesh": dict(mesh.shape)}), flush=True)


def orchestrate() -> None:
    me = os.path.abspath(__file__)
    legs = {}

    def leg(n, cores=None):
        cmd = [sys.executable, me, str(n)]
        if cores is not None:
            cmd = ["taskset", "-c", cores] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True,
                             check=True).stdout
        rec = json.loads([ln for ln in out.splitlines()
                          if ln.startswith("LEG ")][-1][4:])
        rec["cores"] = cores or "all"
        print(rec, flush=True)
        return rec

    # pinned regime: N virtual devices on N cores (true scaling proxy)
    legs["pinned_1"] = leg(1, "0")
    legs["pinned_2"] = leg(2, "0-1")
    t1, t2 = legs["pinned_1"]["seconds"], legs["pinned_2"]["seconds"]
    eff2 = 100.0 * t1 / (2 * t2)
    print(f"pinned 1->2 device scaling efficiency: {eff2:.0f}%",
          flush=True)

    # oversubscribed regime: fixed 2-core host, overhead factor only
    legs["fixedhost_1"] = leg(1)
    for n in (2, 4, 8):
        legs[f"fixedhost_{n}"] = leg(n)
    tf1 = legs["fixedhost_1"]["seconds"]
    overhead = {n: round(legs[f"fixedhost_{n}"]["seconds"] / tf1, 2)
                for n in (2, 4, 8)}
    print(f"fixed-host overhead factors (ideal 1.0): {overhead}",
          flush=True)

    out = {
        "workload": "sharded_replicate_blopt: 16 replicates x 16384 "
                    "sites x 8 taxa x 20 adam steps",
        "platform": "virtual CPU devices on a 2-core host "
                    "(xla_force_host_platform_device_count)",
        "pinned_proxy": {
            "description": "taskset-pinned: N devices on N cores, "
                           "each virtual device ~ one single-core "
                           "host; shared-memory collectives stand in "
                           "for ICI",
            "t_1dev_1core_s": t1,
            "t_2dev_2core_s": t2,
            "efficiency_pct_at_2": round(eff2, 1),
            "mesh_at_2": legs["pinned_2"]["mesh"],
        },
        "fixed_host_overhead": {
            "description": "N devices time-slicing all 2 cores; "
                           "ideal factor 1.0 (constant hardware). "
                           "Validates partitioning executes, NOT an "
                           "efficiency number",
            "factors_vs_1dev": overhead,
        },
        "caveat": "2-core machine caps the pinned curve at N=2; ICI "
                  "latency/bandwidth are not modeled",
        "legs": legs,
    }
    with open(os.path.join(HERE, "scaling_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote conformance/scaling_r05.json")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_leg(int(sys.argv[1]))
    else:
        orchestrate()
