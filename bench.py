"""Benchmark harness: flagship-kernel throughput on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: pruning-likelihood site evaluations per second
(alignment sites x full-tree WAG+Gamma4 LL evals / s) on a 16-taxon,
32k-site problem — the inner loop of tree search and bootstrap
support (the reference has no published numbers, BASELINE.md, so
vs_baseline is against the recorded self-baseline below).

Extra metrics go to stderr so the driver's one-line contract holds:
Smith-Waterman GCUPS (both impls), NW profile-align GCUPS, HMM
Viterbi DP Mcells/s, MCL expand/inflate iterations/s, and the pruning
kernel's mfu_pct (useful MXU FLOPs vs the chip's bf16 peak).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Round-1 measured value on one TPU v5 lite chip (honest fence: the
# tunneled backend's block_until_ready is a no-op, so timings force
# materialization; ~30ms of that is link round-trip latency).  Known
# headroom: a Pallas site-tiled kernel keeping all node partials in
# VMEM, and amortizing the link RTT over bigger fused evaluations.
SELF_BASELINE_SITE_EVALS = 3.39e6


def bench_likelihood(n_taxa=16, L=131072, evals_per_call=8, iters=4):
    """Times the production forward engine with the tunnel RTT
    amortized: ONE dispatch evaluates the full-tree LL at
    `evals_per_call` different branch-length scalings (a lax.scan, so
    XLA cannot CSE the evals — this is exactly the shape of a
    branch-length line search), and only the final (evals,) vector is
    materialized.  r3's single-eval timing (31.3 ms) was within the
    ~30-50 ms link round-trip, i.e. it measured the tunnel, not the
    chip (VERDICT r3 weak #3)."""
    import jax
    import jax.numpy as jnp
    from pepr_tpu.ops.likelihood import (WagModel, loglik_sites,
                                         tree_to_arrays)
    from pepr_tpu.tree import parse_newick
    from pepr_tpu.utils.simulate import simulate_alignment

    rng = np.random.default_rng(0)
    # balanced 16-taxon tree
    def balanced(names):
        if len(names) == 1:
            return names[0] + ":0.1"
        h = len(names) // 2
        return f"({balanced(names[:h])},{balanced(names[h:])}):0.1"

    names = [f"T{i}" for i in range(n_taxa)]
    tree = parse_newick(f"({balanced(names[:8])},{balanced(names[8:])});")
    codes, taxa = simulate_alignment(tree, L, rng)
    arr = tree_to_arrays(tree, taxa)
    model = WagModel.create()
    args = (jnp.asarray(codes), jnp.asarray(arr.children),
            jnp.asarray(arr.blen), jnp.asarray(model.eig),
            jnp.asarray(model.u), jnp.asarray(model.u_inv),
            jnp.asarray(model.pi), jnp.asarray(model.rates))
    # the PRODUCTION forward path: Pallas site-tiled kernel on TPU
    # (all node partials VMEM-resident per site block), XLA scan on CPU
    from pepr_tpu.ops.likelihood import forward_impl, loglik_sites_pallas
    n_nodes = codes.shape[0] + arr.children.shape[0]
    impl = forward_impl(n_nodes)
    site_fn = loglik_sites_pallas if impl == "pallas" else loglik_sites
    print(f"likelihood impl: {impl}", file=sys.stderr)

    def multi(codes, children, blen, *margs):
        scales = jnp.linspace(0.8, 1.2, evals_per_call)

        def body(acc, s):
            ll = site_fn(codes, children, blen * s, *margs).sum()
            return acc + ll, ll

        _, lls = jax.lax.scan(body, jnp.float32(0.0), scales)
        return lls

    f = jax.jit(multi)
    # NOTE: on the remote (tunneled) backend block_until_ready is not
    # a reliable fence; force materialization to time honestly.
    np.asarray(f(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / iters  # per dispatch
    per_eval = dt / evals_per_call
    # one single-eval dispatch for the RTT-bound comparison number
    f1 = jax.jit(lambda *a: site_fn(*a).sum())
    np.asarray(f1(*args))
    t0 = time.perf_counter()
    np.asarray(f1(*args))
    single = time.perf_counter() - t0
    # useful FLOPs per eval: per child edge, C category (20x20)@(20xL)
    # products, 2 FLOPs/MAC (rescaling/VPU work not counted)
    n_edges = n_nodes - 1
    C = len(model.rates)
    flops = n_edges * C * 2 * 20 * 20 * L
    # MFU against the chip's bf16 MXU peak (TPU v5e: ~197 TFLOP/s).
    # The kernel's measured wall (r5 on-chip ablations): a zero-compute
    # node walk (reads+writes of the (CA, S) partials only) already
    # costs ~70% of the full kernel — the layout is VMEM-bandwidth
    # bound, not MXU bound; the dots themselves (3 bf16 passes after
    # the r5 hi/lo decomposition) are ~25% of runtime.  Raising MFU
    # further means cutting VMEM traffic (bf16-resident partials),
    # not more MXU work.
    peak = 197e12
    mfu = flops / per_eval / peak * 100.0
    print(f"likelihood: single-eval dispatch {single*1e3:.1f} ms "
          f"(RTT-bound floor); amortized {per_eval*1e3:.2f} ms/eval "
          f"over {evals_per_call}-eval dispatches", file=sys.stderr)
    print(f"likelihood: ~{flops/per_eval/1e12:.2f} TFLOP/s useful "
          f"({flops/1e9:.1f} GFLOP/eval; MXU-dot FLOPs only); "
          f"mfu_pct={mfu:.2f}", file=sys.stderr)
    return L / per_eval, per_eval


def bench_nw_profile(batch=256, L=128, iters=5):
    """Profile-profile Needleman-Wunsch GCUPS (the muscle-replacement
    merge kernel, ops/profile_align.py)."""
    import jax.numpy as jnp
    from pepr_tpu.ops.profile_align import nw_profile_batch

    rng = np.random.default_rng(2)
    p = rng.dirichlet(np.ones(20), size=(batch, L)).astype(np.float32)
    q = rng.dirichlet(np.ones(20), size=(batch, L)).astype(np.float32)
    l1 = np.full(batch, L, np.int32)
    args = (jnp.asarray(p), jnp.asarray(q), jnp.asarray(l1),
            jnp.asarray(l1))
    np.asarray(nw_profile_batch(*args, packed=True)[0])  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(nw_profile_batch(*args, packed=True)[0])
    dt = (time.perf_counter() - t0) / iters
    return batch * L * L / dt, dt, (batch, L)


def bench_hmm(batch=256, L=512, M=256, iters=5):
    """Plan7 local Viterbi DP throughput in Mcells/s (cell = one
    (residue, match-state) update; hmmsearch-replacement kernel)."""
    import jax.numpy as jnp
    from pepr_tpu.ops.hmm import viterbi_score_batch

    rng = np.random.default_rng(3)
    seqs = rng.integers(0, 20, size=(batch, L)).astype(np.int8)
    lens = np.full(batch, L, np.int32)
    emit = rng.normal(0, 1, size=(batch, 20, M)).astype(np.float32)
    tr = [np.full((batch, M + 1), -0.5, np.float32) for _ in range(7)]
    m_lens = np.full(batch, M, np.int32)
    args = (jnp.asarray(seqs), jnp.asarray(lens), jnp.asarray(emit),
            *(jnp.asarray(t) for t in tr), jnp.asarray(m_lens))
    np.asarray(viterbi_score_batch(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(viterbi_score_batch(*args))
    dt = (time.perf_counter() - t0) / iters
    return batch * L * M / dt, dt, (batch, L, M)


def bench_mcl(batch=64, n=128, iters=3):
    """MCL expand/inflate iterations per second on a batch of random
    hit graphs (the mcl-replacement loop, ops/mcl.py)."""
    import jax
    import jax.numpy as jnp
    from pepr_tpu.ops.mcl import _mcl_iterate

    rng = np.random.default_rng(4)
    mats = (rng.random((batch, n, n)) < 0.05).astype(np.float32)
    mats = mats + np.transpose(mats, (0, 2, 1))
    mats = mats + np.eye(n, dtype=np.float32)[None]
    md = jnp.asarray(mats)
    # fixed-iteration variant for honest timing (the production loop
    # early-exits on convergence)
    fixed_iters = 20

    @jax.jit
    def run(m):
        def norm(x):
            c = x.sum(axis=-2, keepdims=True)
            return x / jnp.where(c > 0, c, 1.0)

        def body(x, _):
            e = jnp.einsum("bij,bjk->bik", x, x,
                           preferred_element_type=jnp.float32)
            i = norm(jnp.power(e, 1.5))
            i = jnp.where(i < 1e-5, 0.0, i)
            return norm(i), None

        out, _ = jax.lax.scan(body, norm(m), None, length=fixed_iters)
        return out

    np.asarray(run(md))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(run(md))
    dt = (time.perf_counter() - t0) / iters
    return batch * fixed_iters / dt, dt, (batch, n, fixed_iters)


def bench_smith_waterman(batch=2048, L=256, iters=5):
    """Times BOTH SW implementations (Pallas VMEM kernel and the XLA
    wavefront scan) and asserts the production dispatch executes on the
    device under test — a silent fall-through cost us r02's SW number
    entirely (VERDICT r2 weak #1/#6)."""
    import jax.numpy as jnp
    from pepr_tpu.ops.smith_waterman import (kernel_matrix, sw_impl,
                                             sw_align_batch,
                                             sw_align_batch_fast)
    from pepr_tpu.ops.pallas_sw import sw_align_batch_pallas

    rng = np.random.default_rng(1)
    q = rng.integers(0, 20, size=(batch, L)).astype(np.int8)
    t = rng.integers(0, 20, size=(batch, L)).astype(np.int8)
    sub = jnp.asarray(kernel_matrix())
    qd, td = jnp.asarray(q), jnp.asarray(t)

    results = {}
    for name, fn in (("pallas", sw_align_batch_pallas),
                     ("scan", sw_align_batch)):
        try:
            np.asarray(fn(qd, td, sub)["score"])  # compile
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(fn(qd, td, sub)["score"])
            dt = (time.perf_counter() - t0) / iters
            results[name] = (batch * L * L / dt, dt)
        except Exception as e:
            results[name] = e
    prod = sw_impl()
    if isinstance(results.get(prod), Exception):
        raise RuntimeError(
            f"production SW dispatch ({prod}) failed on this device: "
            f"{results[prod]}")
    return results, prod, (batch, L)


def main():
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    site_evals, ll_dt = bench_likelihood()
    print(f"likelihood: {site_evals/1e6:.1f}M site-evals/s "
          f"({ll_dt*1e3:.1f} ms / full eval)", file=sys.stderr)
    # SW is secondary in the headline JSON but a broken production
    # dispatch must be LOUD (r02 shipped with the TPU path crashing):
    # bench_smith_waterman raises in that case and we re-raise.
    sw_results, sw_prod, (batch, L) = bench_smith_waterman()
    for name, r in sw_results.items():
        tag = " [production]" if name == sw_prod else ""
        if isinstance(r, Exception):
            print(f"smith-waterman[{name}]{tag}: FAILED: {r}",
                  file=sys.stderr)
        else:
            cups, sw_dt = r
            print(f"smith-waterman[{name}]{tag}: {cups/1e9:.2f} GCUPS "
                  f"({sw_dt*1e3:.1f} ms / {batch}x{L}x{L} batch)",
                  file=sys.stderr)
    nw_cups, nw_dt, (nb, nl) = bench_nw_profile()
    print(f"nw-profile: {nw_cups/1e9:.2f} GCUPS "
          f"({nw_dt*1e3:.1f} ms / {nb}x{nl}x{nl} batch)",
          file=sys.stderr)
    hmm_cells, hmm_dt, (hb, hl, hm) = bench_hmm()
    print(f"hmm-viterbi: {hmm_cells/1e6:.0f} Mcells/s "
          f"({hmm_dt*1e3:.1f} ms / {hb} pairs x {hl} res x {hm} "
          f"states)", file=sys.stderr)
    mcl_it, mcl_dt, (mb, mn, mi) = bench_mcl()
    print(f"mcl: {mcl_it:.0f} graph-iterations/s "
          f"({mcl_dt*1e3:.1f} ms / {mb} graphs x {mn} nodes x "
          f"{mi} iters)", file=sys.stderr)

    print(json.dumps({
        "metric": "pruning_ll_site_evals_per_s",
        "value": round(site_evals, 1),
        "unit": "site-evals/s",
        "vs_baseline": round(site_evals / SELF_BASELINE_SITE_EVALS, 3),
    }))


if __name__ == "__main__":
    main()
