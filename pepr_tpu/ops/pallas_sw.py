"""Pallas TPU kernel for batched affine-gap Smith-Waterman.

The XLA wavefront (ops/smith_waterman.py) is bound by per-step
`lax.scan` dispatch overhead (~80us/diagonal on the tunneled backend:
512x256x256 batches ran at 0.8 GCUPS).  This kernel runs the whole
wavefront as a `fori_loop` inside one grid program with every DP state
vector resident in VMEM, so a diagonal step costs VPU work only.

Grid: one program per TB-pair tile.  Layout: the query axis rides the
128-wide lanes, pairs ride sublanes.  Per-diagonal substitution scores
come from a one-hot compare-and-sum against the per-program
query-substitution slab (built once per program with an MXU contraction
— same no-gather discipline as the XLA kernel).

Semantics are identical to sw_align_batch (scores, match/length
trackers, best-cell coordinates), verified in interpret mode by
tests/test_pallas_sw.py.  Reference role: the blat/blastall all-vs-all
scorer (BlatRunner.java:424-430).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
N_SUB = 32  # substitution codes padded to a sublane multiple
TB = 8  # pairs per grid program


def _shift_lanes(x, fill):
    """x[..., i] -> x[..., i-1] with `fill` at lane 0 (the wavefront's
    "row i-1" feed; circular roll + masked fix of lane 0)."""
    rolled = pltpu.roll(x, 1, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane == 0, fill, rolled)


def _kernel(q_ref, t_rp_ref, sub_ref, score_ref, match_ref, len_ref,
            qend_ref, diag_ref, troll, subq, h1, h2, e1, f1, mh1, mh2,
            me1, mf1, lh1, lh2, le1, lf1):
    Lq = q_ref.shape[1]
    D = t_rp_ref.shape[1]
    Lt = D - 2 * Lq + 1
    gap_open = jnp.float32(11.0)
    gap_extend = jnp.float32(1.0)

    # Mosaic cannot lower lane-dim dynamic slices at non-128-aligned
    # offsets, so instead of slicing the reversed target per diagonal
    # we keep a rolling copy in VMEM: lane [0, Lq) IS the diagonal-k
    # window after k single-lane rolls (start offset decreases by one
    # per wavefront step).
    start0 = Lq + Lt - 2  # diagonal-0 window offset in t_rp
    troll[...] = pltpu.roll(t_rp_ref[...].astype(jnp.int32),
                            D - start0, axis=1)

    qc = q_ref[...].astype(jnp.int32)  # (TB, Lq)
    # per-program substitution slab: subq[b, a, i] = sub[a, q[b, i]]
    # built once via one-hot (TB, N_SUB, Lq)
    code_ax = jax.lax.broadcasted_iota(jnp.int32, (TB, N_SUB, Lq), 1)
    q1h = (qc[:, None, :] == code_ax).astype(jnp.float32)
    for b in range(TB):
        subq[b] = jnp.dot(sub_ref[...], q1h[b],
                          preferred_element_type=jnp.float32)

    zf = jnp.zeros((TB, Lq), jnp.float32)
    zi = jnp.zeros((TB, Lq), jnp.float32)
    h1[...] = zf
    h2[...] = zf
    e1[...] = zf + NEG
    f1[...] = zf + NEG
    for r in (mh1, mh2, me1, mf1, lh1, lh2, le1, lf1):
        r[...] = zi

    score_ref[...] = jnp.zeros((TB, 1), jnp.float32)
    match_ref[...] = jnp.zeros((TB, 1), jnp.float32)
    len_ref[...] = jnp.zeros((TB, 1), jnp.float32)
    qend_ref[...] = jnp.zeros((TB, 1), jnp.float32)
    diag_ref[...] = jnp.zeros((TB, 1), jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, Lq), 1)

    def step(k, _):
        # target codes along diagonal k (ascending in query index i):
        # the first Lq lanes of the rolling window
        td = troll[:, :Lq]  # (TB, Lq) int32
        # s[b, i] = subq[b, td[b, i], i] via one-hot compare-and-sum
        td1h = (td[:, None, :] == code_ax).astype(jnp.float32)
        s = jnp.sum(subq[...] * td1h, axis=1)

        h1v, h2v, e1v, f1v = h1[...], h2[...], e1[...], f1[...]
        mh1v, mh2v, me1v, mf1v = mh1[...], mh2[...], me1[...], mf1[...]
        lh1v, lh2v, le1v, lf1v = lh1[...], lh2[...], le1[...], lf1[...]

        h2s = _shift_lanes(h2v, 0.0)
        mh2s = _shift_lanes(mh2v, 0.0)
        lh2s = _shift_lanes(lh2v, 0.0)
        h1s = _shift_lanes(h1v, 0.0)
        mh1s = _shift_lanes(mh1v, 0.0)
        lh1s = _shift_lanes(lh1v, 0.0)
        f1s = _shift_lanes(f1v, jnp.float32(NEG))
        mf1s = _shift_lanes(mf1v, 0.0)
        lf1s = _shift_lanes(lf1v, 0.0)

        e_open = h1v - gap_open
        e_ext = e1v - gap_extend
        e = jnp.maximum(e_open, e_ext)
        eo = e_open >= e_ext
        me = jnp.where(eo, mh1v, me1v)
        le = jnp.where(eo, lh1v, le1v) + 1.0

        f_open = h1s - gap_open
        f_ext = f1s - gap_extend
        f = jnp.maximum(f_open, f_ext)
        fo = f_open >= f_ext
        mf = jnp.where(fo, mh1s, mf1s)
        lf = jnp.where(fo, lh1s, lf1s) + 1.0

        diag = h2s + s
        is_match = (qc == td).astype(jnp.float32)
        mdiag = mh2s + is_match
        ldiag = lh2s + 1.0

        h = jnp.maximum(jnp.maximum(diag, e), jnp.maximum(f, 0.0))
        mh = jnp.where(h == diag, mdiag,
                       jnp.where(h == e, me, jnp.where(h == f, mf, 0.0)))
        lh = jnp.where(h == diag, ldiag,
                       jnp.where(h == e, le, jnp.where(h == f, lf, 0.0)))
        mh = jnp.where(h <= 0.0, 0.0, mh)
        lh = jnp.where(h <= 0.0, 0.0, lh)

        # per-pair best cell of this diagonal (one-hot argmax selection).
        # First-match tie-break via a min-index reduction: cumsum does
        # not lower on TPU Pallas (BENCH_r02), min/iota/where do.
        row_best = jnp.max(h, axis=1, keepdims=True)  # (TB, 1)
        best_lane = jnp.min(jnp.where(h == row_best, lane, Lq),
                            axis=1, keepdims=True)  # (TB, 1)
        is_best = lane == best_lane
        sel_m = jnp.sum(jnp.where(is_best, mh, 0.0), axis=1,
                        keepdims=True)
        sel_l = jnp.sum(jnp.where(is_best, lh, 0.0), axis=1,
                        keepdims=True)
        sel_i = jnp.sum(jnp.where(is_best, lane.astype(jnp.float32),
                                  0.0), axis=1, keepdims=True)
        improved = row_best > score_ref[...]
        score_ref[...] = jnp.where(improved, row_best, score_ref[...])
        match_ref[...] = jnp.where(improved, sel_m, match_ref[...])
        len_ref[...] = jnp.where(improved, sel_l, len_ref[...])
        qend_ref[...] = jnp.where(improved, sel_i, qend_ref[...])
        diag_ref[...] = jnp.where(
            improved, jnp.full((TB, 1), k, jnp.float32), diag_ref[...])

        h1[...], h2[...] = h, h1v
        e1[...], f1[...] = e, f
        mh1[...], mh2[...] = mh, mh1v
        me1[...], mf1[...] = me, mf
        lh1[...], lh2[...] = lh, lh1v
        le1[...], lf1[...] = le, lf
        troll[...] = pltpu.roll(troll[...], 1, axis=1)
        return 0

    jax.lax.fori_loop(0, Lq + Lt - 1, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sw_align_batch_pallas(q: jax.Array, t: jax.Array, sub: jax.Array,
                          interpret: bool = False) -> dict:
    """Drop-in for sw_align_batch (gap_open=11, gap_extend=1 — the
    pipeline's fixed blat-equivalent costs)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    Bp = -(-B // TB) * TB
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)), constant_values=N_SUB - 1)
        t = jnp.pad(t, ((0, Bp - B), (0, 0)), constant_values=N_SUB - 1)
    subp = jnp.full((N_SUB, N_SUB), -1e4, jnp.float32)
    subp = subp.at[: sub.shape[0], : sub.shape[1]].set(sub)
    # reversed+padded targets (same layout as the XLA wavefront)
    pad_code = jnp.full((Bp, Lq), N_SUB - 1, dtype=q.dtype)
    t_rp = jnp.concatenate(
        [pad_code[:, : Lq - 1], t[:, ::-1], pad_code], axis=1)

    grid = (Bp // TB,)
    D = t_rp.shape[1]
    out_shapes = [jax.ShapeDtypeStruct((Bp, 1), jnp.float32)
                  for _ in range(5)]
    scratch = [pltpu.VMEM((TB, D), jnp.int32),
               pltpu.VMEM((TB, N_SUB, Lq), jnp.float32)] + \
        [pltpu.VMEM((TB, Lq), jnp.float32) for _ in range(12)]
    score, match, length, qend, diag = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Lq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_SUB, N_SUB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((TB, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, t_rp, subp)
    q_end = qend[:B, 0].astype(jnp.int32)
    k = diag[:B, 0].astype(jnp.int32)
    return {"score": score[:B, 0],
            "matches": match[:B, 0].astype(jnp.int32),
            "length": length[:B, 0].astype(jnp.int32),
            "q_end": q_end, "t_end": k - q_end}
