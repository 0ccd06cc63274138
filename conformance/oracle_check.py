"""Oracle-validate the golden runs on the REAL concatenated matrices.

VERDICT r4 missing #1: the bundled reference binaries
(/root/reference/pepr-bin_linux/FastTree_WAG, raxmlHPC) were only ever
pointed at small synthetic inputs.  This script runs them over the
actual stage-2 concatenated alignments that produced the conformance
trees (rebuilt from the checkpointed per-family alignments), records
RF distances between their topologies and ours, compares evaluated
log-likelihoods, and settles the Aquificales divergence with a native
AU test of our Hydrogenobaculum resolution against its NNI
alternatives (the reference's ~40% branch, README:32-33).

Outputs (conformance/oracle/):
  {run}_concat.afa / .phy     the rebuilt matrix fed to the oracles
  {run}_fasttree.nwk          FastTree_WAG -gamma -nosupport topology
  {run}_oracle.json           RF + LL comparison numbers
  aqu_au.txt / aqu_au.json    AU report over the focal-branch
                              resolutions (ours + 2 NNI alternatives)

Run: python conformance/oracle_check.py [ery|aqu] ...  (host-only; CPU)
"""

import json
import os
import pickle
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pepr_tpu.alphabet import decode  # noqa: E402
from pepr_tpu.models.concat import concatenate  # noqa: E402
from pepr_tpu.tree import parse_newick, to_newick  # noqa: E402
from pepr_tpu.tree.bipartition import rf_distance  # noqa: E402

ROOT = os.path.dirname(os.path.abspath(__file__))
BIN = "/root/reference/pepr-bin_linux"
OUT = os.path.join(ROOT, "oracle")

RUNS = {
    "ery": (os.path.join(ROOT, "ery_ckpt"),
            os.path.join(ROOT, "ery_out", "erysipelotrichales.nwk")),
    "aqu": (os.path.join(ROOT, "aqu_ckpt"),
            os.path.join(ROOT, "aqu_out", "aquificales.nwk")),
}

# the aqu focal clade: the branch the reference's run left at ~40%
# support joins the Hydrogenobaculum group to the rest of the
# Aquificaceae (Aquifex + Thermocrinis + Hydrogenobacter)
AQU_FOCAL_PREFIXES = ("Hydrogenobaculum", "Aquifex", "Thermocrinis",
                      "Hydrogenobacter")


def load_concat(store_dir):
    with open(os.path.join(store_dir, "alignments.pkl"), "rb") as fh:
        alignments = pickle.load(fh)
    return concatenate(alignments)


def write_afa(cat, path):
    with open(path, "w") as fh:
        for t, row in zip(cat.taxa, cat.mat):
            fh.write(f">{t}\n{decode(row)}\n")


def write_phy(cat, path):
    with open(path, "w") as fh:
        fh.write(f" {len(cat.taxa)} {cat.length}\n")
        for t, row in zip(cat.taxa, cat.mat):
            fh.write(f"{t}  {decode(row)}\n")


def run_fasttree(afa, out_nwk):
    r = subprocess.run([os.path.join(BIN, "FastTree_WAG"), "-gamma",
                        "-nosupport", afa],
                       capture_output=True, timeout=7200)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:].decode())
    nwk = r.stdout.decode().strip().splitlines()[0]
    with open(out_nwk, "w") as fh:
        fh.write(nwk + "\n")
    return nwk


def raxml_eval_ll(phy, tree, name):
    """raxmlHPC -f e: evaluate/optimize BLs on a fixed topology,
    return the final GAMMA log-likelihood (RAxMLRunner.java:215-280)."""
    tdir = os.path.join(OUT, "raxml_" + name)
    os.makedirs(tdir, exist_ok=True)
    tfile = os.path.join(tdir, "in.nwk")
    t = parse_newick(tree) if isinstance(tree, str) else tree
    t.support[:] = np.nan  # raxml rejects support-decorated input trees
    with open(tfile, "w") as fh:
        fh.write(to_newick(t) + "\n")
    for f in os.listdir(tdir):
        if f.startswith("RAxML_"):
            os.unlink(os.path.join(tdir, f))
    r = subprocess.run([os.path.join(BIN, "raxmlHPC"), "-f", "e",
                        "-s", phy, "-t", tfile, "-m", "PROTGAMMAWAG",
                        "-n", name, "-w", tdir],
                       capture_output=True, timeout=7200)
    info = os.path.join(tdir, f"RAxML_info.{name}")
    text = open(info).read() if os.path.exists(info) else \
        r.stdout.decode()
    m = re.search(r"Final GAMMA +likelihood: +(-?[0-9.]+)", text)
    if not m:
        raise RuntimeError("no LL in raxml output: "
                           + text[-2000:] + r.stderr[-500:].decode())
    return float(m.group(1))


def check_run(run):
    store_dir, ours_nwk = RUNS[run]
    cat = load_concat(store_dir)
    print(f"[{run}] concat: {len(cat.taxa)} taxa x {cat.length} cols, "
          f"{cat.n_genes} genes", flush=True)
    afa = os.path.join(OUT, f"{run}_concat.afa")
    phy = os.path.join(OUT, f"{run}_concat.phy")
    write_afa(cat, afa)
    write_phy(cat, phy)

    ours = parse_newick(open(ours_nwk).read().strip())
    ft_path = os.path.join(OUT, f"{run}_fasttree.nwk")
    if os.path.exists(ft_path):
        print(f"[{run}] reusing cached FastTree_WAG tree", flush=True)
        ft = parse_newick(open(ft_path).read().strip())
    else:
        print(f"[{run}] running FastTree_WAG ...", flush=True)
        ft = parse_newick(run_fasttree(afa, ft_path))
    rf = rf_distance(ours, ft)
    print(f"[{run}] RF(ours, FastTree_WAG) = {rf}", flush=True)

    print(f"[{run}] raxmlHPC -f e on both topologies ...", flush=True)
    ll_ours = raxml_eval_ll(phy, ours, f"{run}_ours")
    ll_ft = raxml_eval_ll(phy, ft, f"{run}_ft")
    print(f"[{run}] raxml LL ours={ll_ours:.2f} fasttree={ll_ft:.2f} "
          f"(ours - ft = {ll_ours - ll_ft:+.2f})", flush=True)

    result = {"run": run, "taxa": len(cat.taxa), "columns": cat.length,
              "genes": cat.n_genes, "rf_vs_fasttree": rf,
              "raxml_ll_ours": ll_ours, "raxml_ll_fasttree": ll_ft,
              "raxml_ll_delta": ll_ours - ll_ft}
    with open(os.path.join(OUT, f"{run}_oracle.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    return cat, ours, result


def aqu_au_test(cat, ours):
    """AU test: our focal-branch resolution vs its NNI alternatives."""
    from pepr_tpu.models.au_test import au_report, au_test
    from pepr_tpu.models.treebuild import (_nni_candidate, _nni_moves,
                                           optimize_branch_lengths)
    from pepr_tpu.ops.likelihood import (WagModel, loglik_sites,
                                         tree_to_arrays)
    import jax.numpy as jnp

    with open(os.path.join(RUNS["aqu"][0], "gamma_alpha.pkl"),
              "rb") as fh:
        alpha = pickle.load(fh)
    alpha = float(alpha) if np.isscalar(alpha) or np.ndim(alpha) == 0 \
        else float(alpha[0])
    model = WagModel.create(alpha=alpha)
    print(f"[aqu] AU test at alpha={alpha:.3f}", flush=True)

    arr = tree_to_arrays(ours, cat.taxa)
    n_leaves = len(cat.taxa)
    # focal internal node: descendant leafset == the Aquificaceae incl.
    # Hydrogenobaculum (the ~40% branch of README:32-33)
    target = {i for i, t in enumerate(cat.taxa)
              if t.startswith(AQU_FOCAL_PREFIXES)}
    masks = {}
    focal_k = None
    for k in range(arr.children.shape[0]):
        m = set()
        for c in arr.children[k]:
            if c < 0:
                continue
            m |= masks[int(c)] if c >= n_leaves else {int(c)}
        masks[n_leaves + k] = m
        if m == target:
            focal_k = k
    if focal_k is None:
        raise RuntimeError("focal clade not found in our aqu topology")

    moves = [mv for mv in _nni_moves(arr.children, n_leaves)
             if mv[0] == focal_k]
    print(f"[aqu] focal edge: internal node {focal_k}, "
          f"{len(moves)} NNI alternatives", flush=True)
    cands = [(arr.children.copy(), arr.blen.copy())]
    for mv in moves:
        cands.append(_nni_candidate(arr.children, arr.blen, n_leaves,
                                    [mv]))
    # drop alternatives that rebuild the same unrooted topology
    from pepr_tpu.models.treebuild import _children_bipartitions
    full = (1 << n_leaves) - 1
    seen = set()
    uniq = []
    for ch, bl in cands:
        key = frozenset(_children_bipartitions(ch, n_leaves, full))
        if key in seen:
            continue
        seen.add(key)
        uniq.append((ch, bl))
    print(f"[aqu] {len(uniq)} distinct topologies (incl. ours)",
          flush=True)

    codes = np.asarray(cat.mat, np.int8)
    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    sitelh = []
    from pepr_tpu.ops.likelihood import TreeArrays
    for i, (ch, bl) in enumerate(uniq):
        a = TreeArrays(ch, bl, arr.node_of_tree_node, list(cat.taxa))
        blen, ll = optimize_branch_lengths(codes, a, model, steps=150)
        print(f"[aqu]   topology {i}: LL = {ll:.2f}", flush=True)
        site = loglik_sites(jnp.asarray(codes), jnp.asarray(ch),
                            jnp.asarray(blen), *margs)
        sitelh.append(np.asarray(site))
    sitelh = np.stack(sitelh)

    res = au_test(sitelh, n_reps=10000, seed=4242)
    names = ["ours"] + [f"alt{i}" for i in range(1, len(uniq))]
    report = au_report(res, names)
    print(report, flush=True)
    with open(os.path.join(OUT, "aqu_au.txt"), "w") as fh:
        fh.write(
            "# AU test of the Aquificales focal branch "
            "(Hydrogenobaculum/Aquificaceae resolution)\n"
            "# ours = the conformance topology; altN = NNI "
            "alternatives of the focal edge\n" + report + "\n")
    with open(os.path.join(OUT, "aqu_au.json"), "w") as fh:
        json.dump({"names": names, "au": res.au.tolist(),
                   "np_bp": res.np_bp.tolist(),
                   "obs_dll": res.obs_diff.tolist(),
                   "alpha": alpha, "n_reps": 10000}, fh, indent=1)


def main():
    os.makedirs(OUT, exist_ok=True)
    which = sys.argv[1:] or ["ery", "aqu"]
    for run in which:
        cat, ours, result = check_run(run)
        if run == "aqu":
            aqu_au_test(cat, ours)


if __name__ == "__main__":
    main()


def aqu_strain_au():
    """AU test of the strain-level Hydrogenobaculum split — the
    bipartition where our topology and FastTree_WAG actually differ on
    the real matrix (ours: (HO,SN); FastTree: (3684,SN); branch
    lengths ~1e-5, raxml LL gap 0.0009).  This near-polytomy is the
    natural candidate for the reference's ~40% branch."""
    from pepr_tpu.models.au_test import au_report, au_test
    from pepr_tpu.models.treebuild import (_nni_candidate, _nni_moves,
                                           _children_bipartitions,
                                           optimize_branch_lengths)
    from pepr_tpu.ops.likelihood import (TreeArrays, WagModel,
                                         loglik_sites, tree_to_arrays)
    import jax.numpy as jnp

    cat = load_concat(RUNS["aqu"][0])
    ours = parse_newick(open(RUNS["aqu"][1]).read().strip())
    with open(os.path.join(RUNS["aqu"][0], "gamma_alpha.pkl"),
              "rb") as fh:
        alpha = float(pickle.load(fh))
    model = WagModel.create(alpha=alpha)
    arr = tree_to_arrays(ours, cat.taxa)
    n_leaves = len(cat.taxa)
    target = {i for i, t in enumerate(cat.taxa)
              if t in ("Hydrogenobaculum_sp._HO",
                       "Hydrogenobaculum_sp._SN")}
    masks = {}
    focal_k = None
    for k in range(arr.children.shape[0]):
        m = set()
        for c in arr.children[k]:
            if c < 0:
                continue
            m |= masks[int(c)] if c >= n_leaves else {int(c)}
        masks[n_leaves + k] = m
        if m == target:
            focal_k = k
    moves = [mv for mv in _nni_moves(arr.children, n_leaves)
             if mv[0] == focal_k]
    cands = [(arr.children.copy(), arr.blen.copy())] + \
        [_nni_candidate(arr.children, arr.blen, n_leaves, [mv])
         for mv in moves]
    full = (1 << n_leaves) - 1
    seen, uniq = set(), []
    for ch, bl in cands:
        key = frozenset(_children_bipartitions(ch, n_leaves, full))
        if key in seen:
            continue
        seen.add(key)
        uniq.append((ch, bl))
    codes = np.asarray(cat.mat, np.int8)
    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    sitelh = []
    for i, (ch, bl) in enumerate(uniq):
        a = TreeArrays(ch, bl, arr.node_of_tree_node, list(cat.taxa))
        blen, ll = optimize_branch_lengths(codes, a, model, steps=150)
        print(f"[aqu-strain] topology {i}: LL = {ll:.2f}", flush=True)
        sitelh.append(np.asarray(loglik_sites(
            jnp.asarray(codes), jnp.asarray(ch), jnp.asarray(blen),
            *margs)))
    res = au_test(np.stack(sitelh), n_reps=10000, seed=777)
    names = ["ours_(HO,SN)"] + [f"alt{i}" for i in range(1, len(uniq))]
    report = au_report(res, names)
    print(report, flush=True)
    with open(os.path.join(OUT, "aqu_strain_au.txt"), "w") as fh:
        fh.write("# AU test of the Hydrogenobaculum STRAIN split "
                 "(the RF=2 bipartition vs FastTree_WAG)\n" + report
                 + "\n")
