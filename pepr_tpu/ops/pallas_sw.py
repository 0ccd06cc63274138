"""Pallas TPU kernel for batched affine-gap Smith-Waterman.

Row-sequential scan formulation (r4 redesign; the r3 anti-diagonal
wavefront lost to its own XLA fallback because it rebuilt a one-hot
substitution lookup every diagonal).  This kernel walks the TARGET
axis one position per step with the query axis on the 128-wide lanes:

- substitution scores come from a per-chunk slab S[b, j, i] =
  sub[t[b, j], q[b, i]] built with MXU one-hot contractions (two small
  matmuls per pair per chunk, amortized over the chunk's steps) — the
  inner loop only reads lane-aligned slab rows;
- the within-row gap state F (gap consuming the query) is the one
  dependency a row step can't vectorize directly; it is computed
  EXACTLY from the gap-open candidates with a Kogge-Stone max-scan
  over lanes (log2(Lq) shifted maxes).  Replacing H with the
  F-less H0 in the F recurrence is exact whenever gap_open >
  gap_extend >= 0 (opening from an F-derived cell always loses to
  extending the same gap), which holds for both production parameter
  sets (blastp 11/1, blastn 5/2);
- the DP runs in int32 (all scores are integers), and the
  match/length trackers ride ONE packed int32 per state
  ((matches << 16) | length), halving tracker traffic.

Lt steps instead of the wavefront's Lq+Lt-1, no per-step one-hot.
Semantics are identical to sw_align_batch up to tie-breaking of
equal-scoring best cells (this kernel scans target-major, the XLA
wavefront diagonal-major), verified by tests/test_pallas_sw.py.
Reference role: the blat/blastall all-vs-all scorer
(BlatRunner.java:424-430).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 24)
N_SUB = 32  # substitution codes padded to a lane-friendly size
LEN_BIAS = 1 << 14  # keeps the packed length field positive mid-scan
TC = 128  # slab chunk height (Mosaic needs a full-lane minor dim)


def _tile_pairs(Lq: int) -> int:
    """Pairs per grid program: the per-step vector-op COUNT is
    independent of the tile height, so a tall tile amortizes per-op
    issue overhead over more sublanes (TB=8 ran 1.8 GCUPS, TB=32 ran
    3.4 on the same chip/shape).  Bounded so the packed score slab
    (tb, TC, Lq) int32 stays within ~8 MB of VMEM."""
    return int(max(8, min(64, (1 << 14) // max(Lq, 1))))


def _shift(x, n, fill):
    """x[..., i] -> x[..., i-n] with `fill` in lanes < n (circular
    roll + masked fix of the wrapped lanes)."""
    rolled = pltpu.roll(x, n, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < n, fill, rolled)


def _kernel(q_ref, t_ref, sub_ref, score_ref, ml_ref, pos_ref,
            sslab, H, E, MLH, MLE, BV, BML, BJ,
            *, go: int, ge: int, tc: int, tb: int):
    Lq = q_ref.shape[1]
    Lt = t_ref.shape[1]
    n_chunks = Lt // tc
    # exclusive prefix-max over Lq lanes needs ceil(log2(Lq)) rounds —
    # (Lq-1).bit_length() is exact for ANY Lq (floor(log2) silently
    # under-scans non-power-of-two rows)
    n_scan = max((Lq - 1).bit_length(), 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, Lq), 1)
    code_q = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, Lq), 0)
    code_t = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, tc), 0)

    zi = jnp.zeros((tb, Lq), jnp.int32)
    H[...] = zi
    E[...] = zi + NEG
    MLH[...] = zi
    MLE[...] = zi
    BV[...] = zi
    BML[...] = zi
    BJ[...] = zi

    def chunk_body(c, _):
        j0 = c * tc
        # per-pair slab build: ONE MXU contraction per pair yields the
        # packed slab 2*sub[t[j], q[i]] + (t[j]==q[i]) (score and
        # match indicator share the int32; amortized over tc steps)
        for b in range(tb):
            qc = q_ref[pl.ds(b, 1), :].astype(jnp.int32)  # (1, Lq)
            tcodes = t_ref[pl.ds(b, 1), pl.ds(j0, tc)].astype(jnp.int32)
            q1h = (qc == code_q).astype(jnp.float32)  # (N_SUB, Lq)
            t1h = (tcodes == code_t).astype(jnp.float32)  # (N_SUB, tc)
            subq = jnp.dot(sub_ref[...], q1h,
                           preferred_element_type=jnp.float32)
            sm_c = jax.lax.dot_general(
                t1h, 2.0 * subq + q1h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (tc, Lq)
            sslab[b] = sm_c.astype(jnp.int32)

        def step(jj, _):
            sm = sslab[:, pl.ds(jj, 1), :][:, 0, :]  # (TB, Lq)
            s = sm >> 1  # floor halving recovers the score exactly
            msp = ((sm & 1) << 16) + 1
            Hp, Ep = H[...], E[...]
            MLHp, MLEp = MLH[...], MLE[...]

            # E: gap consuming the target (same lane, previous step)
            e_open = Hp - go
            e_ext = Ep - ge
            take_e = e_open >= e_ext
            e = jnp.maximum(e_open, e_ext)
            mle = jnp.where(take_e, MLHp, MLEp) + 1

            # diagonal: previous step, lane i-1
            diag = _shift(Hp, 1, 0) + s
            mldiag = _shift(MLHp, 1, 0) + msp

            h0 = jnp.maximum(diag, jnp.maximum(e, 0))
            ml0 = jnp.where(h0 == diag, mldiag,
                            jnp.where(h0 == e, mle, 0))
            ml0 = jnp.where(h0 <= 0, 0, ml0)

            # F: gap consuming the query — exact via exclusive
            # Kogge-Stone max-scan of the open candidates
            a = h0 - go + ge * lane
            mla = ml0 + (LEN_BIAS - lane)
            p = _shift(a, 1, NEG)
            mlp = _shift(mla, 1, 0)
            for sh in range(n_scan):
                pv = _shift(p, 1 << sh, NEG)
                mlv = _shift(mlp, 1 << sh, 0)
                take = pv > p  # ties keep the more recent open
                p = jnp.where(take, pv, p)
                mlp = jnp.where(take, mlv, mlp)
            f = p - ge * lane + ge
            mlf = mlp + (lane - LEN_BIAS)

            use_f = f > h0
            h = jnp.where(use_f, f, h0)
            mlh = jnp.where(use_f, mlf, ml0)

            # per-LANE running best (no cross-lane reductions in the
            # inner loop; one final argmax after the sweep)
            improved = h > BV[...]
            BV[...] = jnp.where(improved, h, BV[...])
            BML[...] = jnp.where(improved, mlh, BML[...])
            BJ[...] = jnp.where(improved, jnp.full_like(h, j0 + jj),
                                BJ[...])

            H[...], E[...] = h, e
            MLH[...], MLE[...] = mlh, mle
            return 0

        jax.lax.fori_loop(0, tc, step, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # final cross-lane argmax (first best lane; its earliest target row)
    bv = BV[...]
    row_best = jnp.max(bv, axis=1, keepdims=True)
    best_lane = jnp.min(jnp.where(bv == row_best, lane, Lq),
                        axis=1, keepdims=True)
    is_best = lane == best_lane
    score_ref[...] = row_best
    ml_ref[...] = jnp.sum(jnp.where(is_best, BML[...], 0), axis=1,
                          keepdims=True)
    sel_j = jnp.sum(jnp.where(is_best, BJ[...], 0), axis=1,
                    keepdims=True)
    pos_ref[...] = best_lane + (sel_j << 16)


def _chunk_rows(Lt: int) -> int:
    """Target-chunk height: TC lanes when the target is long enough
    (Mosaic rejects sub-128 minor dims on real hardware; shorter
    targets only occur in interpret-mode tests)."""
    tc = min(Lt, TC)
    while Lt % tc:
        tc //= 2
    return max(tc, 1)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend",
                                             "interpret"))
def sw_align_batch_pallas(q: jax.Array, t: jax.Array, sub: jax.Array,
                          gap_open: int = 11, gap_extend: int = 1,
                          interpret: bool = False) -> dict:
    """Drop-in for sw_align_batch.  Requires gap_open > gap_extend >= 0
    (both production parameter sets qualify; see module docstring)."""
    if not gap_open > gap_extend >= 0:
        raise ValueError("scan-formulation SW needs gap_open > "
                         "gap_extend >= 0")
    B, Lq = q.shape
    Lt = t.shape[1]
    tb = _tile_pairs(Lq)
    Bp = -(-B // tb) * tb
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)), constant_values=N_SUB - 1)
        t = jnp.pad(t, ((0, Bp - B), (0, 0)), constant_values=N_SUB - 1)
    subp = jnp.full((N_SUB, N_SUB), -(1 << 16), jnp.float32)
    subp = subp.at[: sub.shape[0], : sub.shape[1]].set(sub)

    tc = _chunk_rows(Lt)
    grid = (Bp // tb,)
    out_shapes = [jax.ShapeDtypeStruct((Bp, 1), jnp.int32)
                  for _ in range(3)]
    scratch = [pltpu.VMEM((tb, tc, Lq), jnp.int32)] + \
        [pltpu.VMEM((tb, Lq), jnp.int32) for _ in range(7)]
    kern = functools.partial(_kernel, go=int(gap_open),
                             ge=int(gap_extend), tc=tc, tb=tb)
    score, ml, pos = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, Lq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Lt), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_SUB, N_SUB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tb, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, t, subp)
    score = score[:B, 0]
    ml = ml[:B, 0]
    pos = pos[:B, 0]
    return {"score": score.astype(jnp.float32),
            "matches": ml >> 16,
            "length": ml & 0xFFFF,
            "q_end": pos & 0xFFFF,
            "t_end": pos >> 16}
