"""Benchmark harness: flagship-kernel throughput on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: pruning-likelihood site evaluations per second
(alignment sites x full-tree WAG+Gamma4 LL evals / s) on a 16-taxon,
32k-site problem — the inner loop of tree search and bootstrap
support (the reference has no published numbers, BASELINE.md, so
vs_baseline is against the recorded self-baseline below).

Extra metrics (Smith-Waterman GCUPS, NW profile-align GCUPS) go to
stderr so the driver's one-line contract holds.
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
    print(f"likelihood: single-eval dispatch {single*1e3:.1f} ms "
          f"(RTT-bound floor); amortized {per_eval*1e3:.2f} ms/eval "
          f"over {evals_per_call}-eval dispatches", file=sys.stderr)
    print(f"likelihood: ~{flops/per_eval/1e12:.2f} TFLOP/s useful "
          f"({flops/1e9:.1f} GFLOP/eval; MXU-dot FLOPs only)",
          file=sys.stderr)
    return L / per_eval, per_eval


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

    print(json.dumps({
        "metric": "pruning_ll_site_evals_per_s",
        "value": round(site_evals, 1),
        "unit": "site-evals/s",
        "vs_baseline": round(site_evals / SELF_BASELINE_SITE_EVALS, 3),
    }))


if __name__ == "__main__":
    main()
