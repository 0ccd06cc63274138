"""Device-mesh sharding for the likelihood/bootstrap fan-out.

The reference's concurrency mechanisms (thread pools over gene
families, jackknife replicates, query shards — SURVEY section 2c) map
onto a 2-D device mesh:

- axis "rep" (data-parallel): jackknife/bootstrap replicates — each
  replicate is a (site-weights, topology, branch-lengths) triple of
  identical shape, so the whole replicate fan-out is one sharded
  computation (replacing PhylogenomicPipeline2.java:1039-1099's
  RAM-throttled thread pool).
- axis "site" (sequence-parallel): alignment columns are independent
  in the pruning kernel, so partials shard cleanly along L; the only
  cross-device communication is the final weighted-sum reduction
  (psum over ICI).

Collectives are inserted by XLA from sharding annotations (jit +
NamedSharding) — no hand-written NCCL/MPI analog is needed.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pepr_tpu.ops.likelihood import (WagModel, forward_impl,
                                     loglik_sites, loglik_weighted)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host init (jax.distributed) — the TPU-native replacement
    for the reference's dead RemoteHost hooks (SURVEY §2c final row).

    Reads PEPR_COORDINATOR / PEPR_NUM_PROCS / PEPR_PROC_ID when args are
    not given (TPU pods can also rely on jax.distributed's automatic
    environment detection by calling with all-None after setting
    PEPR_COORDINATOR=auto).  Returns True if a multi-process runtime was
    initialized, False for the single-process fallback.
    """
    coordinator = coordinator or os.environ.get("PEPR_COORDINATOR")
    if coordinator is None:
        return False
    if coordinator == "auto":
        jax.distributed.initialize()
    else:
        num_processes = int(num_processes
                            or os.environ["PEPR_NUM_PROCS"])
        process_id = int(process_id if process_id is not None
                         else os.environ["PEPR_PROC_ID"])
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return True


def default_mesh(axes: tuple[str, ...] = ("rep", "site"),
                 devices=None) -> Mesh:
    """Mesh over all devices.

    Multi-process (after initialize_distributed): the 'rep' axis runs
    across processes and the 'site' axis within a process, so replicate
    fan-out needs no inter-host traffic while the site-reduction psum
    rides ICI, never DCN.  Single-process: (R, S) with R*S == D, R as
    square as possible.
    """
    if devices is None:
        devices = jax.devices()
        n_proc = jax.process_count()
        if len(axes) == 2 and n_proc > 1:
            local = len(devices) // n_proc
            grid = np.array(devices).reshape(n_proc, local)
            return Mesh(grid, axes)
    d = len(devices)
    if len(axes) == 1:
        return Mesh(np.array(devices), axes)
    r = int(np.floor(np.sqrt(d)))
    while d % r:
        r -= 1
    grid = np.array(devices).reshape(r, d // r)
    return Mesh(grid, axes)


def _pad_sites(arr: np.ndarray, mult: int, axis: int, fill=0):
    L = arr.shape[axis]
    pad = (-L) % mult
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def shard_sites(mesh: Mesh, codes: np.ndarray, weights: np.ndarray):
    """Place the alignment and site weights sharded along the mesh's
    'site' axis (codes padded with PAD, weights with 0 so padding can
    never contribute)."""
    n_site = mesh.shape["site"]
    codes_p = _pad_sites(np.asarray(codes, np.int8), n_site, 1, fill=24)
    w_p = _pad_sites(np.asarray(weights, np.float32), n_site, 0, fill=0.0)
    codes_s = jax.device_put(
        codes_p, NamedSharding(mesh, P(None, "site")))
    w_s = jax.device_put(w_p, NamedSharding(mesh, P("site")))
    return codes_s, w_s


def sharded_loglik(mesh: Mesh, codes, weights, children, blen,
                   model: WagModel):
    """Site-sharded total log-likelihood: each device computes its site
    slice's weighted LL; XLA reduces with a psum over the 'site' axis."""
    codes_s, w_s = shard_sites(mesh, codes, weights)
    margs = tuple(jnp.asarray(x) for x in
                  (model.eig, model.u, model.u_inv, model.pi, model.rates))

    @jax.jit
    def f(codes, w, children, blen):
        ll = loglik_sites(codes, children, blen, *margs)
        return (ll * w).sum()

    return f(codes_s, w_s, jnp.asarray(children), jnp.asarray(blen))


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _inv_softplus(y):
    y = jnp.maximum(y, 1e-6)
    return jnp.where(y > 20, y, jnp.log(jnp.expm1(y)))


def _rep_chunk(R: int, L: int, n_nodes: int, n_cats: int,
               budget_bytes: int = 2_000_000_000) -> int:
    """Site chunk so the vmapped per-chunk partials live set stays
    under `budget_bytes`: each (rep, site-lane) costs
    n_nodes*C*20 f32, with ~3 copies live across forward + remat
    backward.  The remote TPU worker is OOM-killed (not a clean
    RESOURCE_EXHAUSTED) when this is oversized — budget conservatively."""
    per_lane = n_nodes * n_cats * 20 * 4 * 3
    c = max(int(budget_bytes // max(R * per_lane, 1)), 128)
    c = int(2 ** np.floor(np.log2(c)))
    return min(c, int(2 ** np.ceil(np.log2(max(L, 1)))), 4096)


# Per-device-call work ceiling in replicate x site x NODE x Adam-step
# units.  The remote tunnel drops (and can wedge) device calls that
# run for minutes, and a 200-step x 16-rep x 32k-site blopt is one
# such call — the r4 ery run killed the TPU worker exactly there.
# Segmenting the optimizer into short calls with the Adam state
# carried between them keeps each call ~10-20 s and makes the whole
# phase kill-tolerant.  r5: the metric now includes the tree's node
# count — the r4 constant was calibrated on 12-taxon trees (23 nodes)
# and the 52-taxon scale run's ~4x-longer steps got the worker killed
# again with the node factor missing (8M rep-site x 23 nodes ~= 184M).
MAX_BLOPT_CALL_WORK = 184_000_000


def _rep_nll_fns(codes, rc, rw, margs, chunk, impl="scan"):
    """codes is either (n_leaves, L) shared across replicates or
    (R, n_leaves, Lsel) per-replicate (mask-compacted columns)."""
    per_rep_codes = codes.ndim == 3

    def one_nll(theta, children, w, cd):
        return -loglik_weighted(cd, children, _softplus(theta), *margs,
                                w, chunk=chunk, remat=True, impl=impl)

    nll_v = jax.vmap(one_nll,
                     in_axes=(0, 0, 0, 0 if per_rep_codes else None))

    def nll(theta, children, w):
        return nll_v(theta, children, w, codes)

    def total(theta):
        return nll(theta, rc, rw).sum()

    return nll, total


@functools.partial(jax.jit, static_argnames=("n_steps", "chunk", "lr",
                                             "impl"))
def _rep_blopt_seg(codes, rw, rc, theta, mu, nu, t0, eig, u, ui, pi,
                   rates, n_steps: int, chunk: int, lr: float,
                   impl: str = "scan"):
    """`n_steps` Adam steps on the vmapped replicate nll; the optimizer
    state (mu, nu, t) is carried across calls.  Update arithmetic
    matches optax.adam(lr) defaults exactly (b1=.9, b2=.999, eps=1e-8)
    so segmented and single-call runs agree."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    _, total = _rep_nll_fns(codes, rc, rw, (eig, u, ui, pi, rates), chunk,
                            impl=impl)

    def body(carry, _):
        theta, mu, nu, t = carry
        g = jax.grad(total)(theta)
        t = t + 1.0
        mu = b1 * mu + (1.0 - b1) * g
        nu = b2 * nu + (1.0 - b2) * g * g
        mhat = mu / (1.0 - b1 ** t)
        nhat = nu / (1.0 - b2 ** t)
        theta = theta - lr * mhat / (jnp.sqrt(nhat) + eps)
        return (theta, mu, nu, t), None

    (theta, mu, nu, t), _ = jax.lax.scan(
        body, (theta, mu, nu, t0), None, length=n_steps)
    return theta, mu, nu, t


@functools.partial(jax.jit, static_argnames=("chunk", "impl"))
def _rep_ll_jit(codes, rw, rc, theta, eig, u, ui, pi, rates, chunk: int,
                impl: str = "scan"):
    nll, _ = _rep_nll_fns(codes, rc, rw, (eig, u, ui, pi, rates), chunk,
                          impl=impl)
    return -nll(theta, rc, rw)


def sharded_replicate_blopt(mesh: Mesh, codes, rep_weights: np.ndarray,
                            rep_children: np.ndarray,
                            rep_blen: np.ndarray, model: WagModel,
                            steps: int = 60, lr: float = 0.03,
                            block_reps: int = 16):
    """Jackknife fan-out: optimize branch lengths of R replicates (each
    its own topology + site-weight mask) in parallel, replicates sharded
    over the 'rep' mesh axis and sites over the 'site' axis.  The nll is
    site-chunk-scanned with rematerialization (loglik_weighted), so the
    whole replicate batch fits in HBM at golden-run alignment lengths.

    Replicates run in `block_reps`-per-device blocks of the same
    compiled program (the remote TPU worker dies on very wide vmapped
    gradient programs; blocks of 16 run reliably).

    Returns (blen (R, n_nodes), ll (R,)).
    """
    R_total = rep_weights.shape[0]
    block = max(block_reps, 1) * mesh.shape["rep"]
    if R_total > block:
        def pad_block(a):
            pad = (-a.shape[0]) % block
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)],
                                   axis=0)
            return a

        rw, rc, rb = (pad_block(np.asarray(rep_weights)),
                      pad_block(np.asarray(rep_children)),
                      pad_block(np.asarray(rep_blen)))
        outs = [sharded_replicate_blopt(
            mesh, codes, rw[s0:s0 + block], rc[s0:s0 + block],
            rb[s0:s0 + block], model, steps=steps, lr=lr,
            block_reps=block_reps)
            for s0 in range(0, rw.shape[0], block)]
        return (np.concatenate([o[0] for o in outs], axis=0)[:R_total],
                np.concatenate([o[1] for o in outs], axis=0)[:R_total])
    R = rep_weights.shape[0]
    L = rep_weights.shape[1]
    n_rep = mesh.shape["rep"]
    n_site = mesh.shape["site"]
    n_nodes = rep_blen.shape[1]

    # pad replicate axis
    def pad_r(a):
        pad = (-a.shape[0]) % n_rep
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        return a

    rw_full = pad_r(np.asarray(rep_weights, np.float32))
    rc = pad_r(np.asarray(rep_children, np.int32))
    rb = pad_r(np.asarray(rep_blen, np.float32))
    codes_np = np.asarray(codes, np.int8)

    # mask compaction: jackknife masks zero out ~half the sites, and a
    # zero-weight site still costs full pruning compute — gather each
    # replicate's live columns instead (exact same weighted LL, ~2x
    # less work).  Falls back to the shared-codes layout when the
    # weights are dense (e.g. bootstrap resampling counts).
    nz = rw_full > 0
    sel_max = int(nz.sum(axis=1).max()) if rw_full.size else 0
    compact = sel_max <= 0.75 * L
    eff_L = sel_max if compact else L
    chunk = _rep_chunk(-(-R // n_rep), max(eff_L // max(n_site, 1), 1),
                       n_nodes, len(model.rates))
    site_mult = n_site * chunk

    if compact:
        Rp = rw_full.shape[0]
        codes_sel = np.full((Rp, codes_np.shape[0], max(sel_max, 1)),
                            24, np.int8)
        w_sel = np.zeros((Rp, max(sel_max, 1)), np.float32)
        for r in range(Rp):
            idx = np.nonzero(nz[r])[0]
            codes_sel[r, :, :len(idx)] = codes_np[:, idx]
            w_sel[r, :len(idx)] = rw_full[r, idx]
        rw = _pad_sites(w_sel, site_mult, 1)
        codes_p = _pad_sites(codes_sel, site_mult, 2, fill=24)
        codes_s = jax.device_put(
            codes_p, NamedSharding(mesh, P("rep", None, "site")))
    else:
        rw = _pad_sites(rw_full, site_mult, 1)
        codes_p = _pad_sites(codes_np, site_mult, 1, fill=24)
        codes_s = jax.device_put(codes_p,
                                 NamedSharding(mesh, P(None, "site")))
    rw_s = jax.device_put(rw, NamedSharding(mesh, P("rep", "site")))
    rc_s = jax.device_put(rc, NamedSharding(mesh, P("rep")))
    rb_s = jax.device_put(rb, NamedSharding(mesh, P("rep")))

    margs = tuple(jnp.asarray(x) for x in
                  (model.eig, model.u, model.u_inv, model.pi, model.rates))
    # gradient engine: the Pallas forward+backward kernels when the
    # tree fits VMEM (r4 custom VJP), else the remat XLA scan
    impl = forward_impl(n_nodes, grad=True)
    # segment the optimizer into tunnel-safe device calls
    seg = max(1, int(MAX_BLOPT_CALL_WORK
                     // max(rw.shape[0] * rw.shape[1] * n_nodes, 1)))
    theta = _inv_softplus(rb_s)
    mu = jnp.zeros_like(theta)
    nu = jnp.zeros_like(theta)
    t = jnp.float32(0.0)
    done = 0
    import logging as _logging
    import time as _time
    _log = _logging.getLogger("pepr_tpu")
    while done < steps:
        n = min(seg, steps - done)
        _t0 = _time.time()
        theta, mu, nu, t = _rep_blopt_seg(
            codes_s, rw_s, rc_s, theta, mu, nu, t, *margs,
            n_steps=n, chunk=chunk, lr=lr, impl=impl)
        # force materialization per segment: it paces the dispatch
        # stream (an unbounded async queue of segments looks like one
        # multi-minute call to the tunnel's watchdog) and gives the
        # log a liveness signal on long fan-outs
        float(np.asarray(t))
        done += n
        _log.info("blopt: %d/%d steps (seg of %d in %.1fs)", done,
                  steps, n, _time.time() - _t0)
    ll = _rep_ll_jit(codes_s, rw_s, rc_s, theta, *margs,
                     chunk=chunk, impl=impl)
    blen = _softplus(theta)
    if jax.process_count() > 1:
        # multi-host: outputs are sharded across processes; gather the
        # full result on every host (replicate merge over DCN happens
        # once here, not inside the optimization)
        from jax.experimental import multihost_utils
        blen = multihost_utils.process_allgather(blen, tiled=True)
        ll = multihost_utils.process_allgather(ll, tiled=True)
    return np.asarray(blen)[:R], np.asarray(ll)[:R]
