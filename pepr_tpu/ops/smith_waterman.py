"""Batched affine-gap Smith-Waterman on TPU.

The compute replacement for the reference's native all-vs-all protein
search (`blat`/`blastall`, BlatRunner.java:424-430 /
BlastRunner.java:574-581): local alignment scores with BLOSUM62 and
affine gaps, evaluated for a padded batch of (query, target) pairs.

Design (TPU-first): anti-diagonal wavefront — a `lax.scan` over the
Lq+Lt-1 diagonals, each step updating (B, Lq) state vectors on the VPU.
All cells of a diagonal are independent, so there is no in-step
dependency; the batch dimension keeps the vector lanes full.  Alongside
the three affine DP states (H/E/F) the kernel carries match-count and
path-length trackers selected by the same argmax decisions, so
blast8-style identity/length columns come out of the same scan.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pepr_tpu.alphabet import N_CODES
from pepr_tpu.data.blosum62 import blosum62_matrix

NEG = -1e9


def kernel_matrix(dtype=np.float32) -> np.ndarray:
    """BLOSUM62 extended so GAP/PAD rows are strongly negative: padded
    regions can never be part of a positive-scoring local alignment."""
    m = blosum62_matrix(dtype=dtype, gap_score=-1e4, pad_score=-1e4)
    return m


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend"))
def sw_align_batch(q: jax.Array, t: jax.Array, sub: jax.Array,
                   gap_open: int = 11, gap_extend: int = 1) -> dict:
    """Batched local alignment.

    Args:
      q: (B, Lq) int8 query codes (PAD-filled).
      t: (B, Lt) int8 target codes (PAD-filled).
      sub: (N_CODES, N_CODES) float32 substitution matrix
           (`kernel_matrix()`), PAD rows very negative.
      gap_open: penalty charged for the first residue of a gap.
      gap_extend: penalty for each further residue.

    Returns dict of (B,) arrays: score, matches, length (aligned
    columns on the optimal path), q_end, t_end (0-based inclusive).
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    open_cost = jnp.float32(gap_open)
    ext_cost = jnp.float32(gap_extend)

    # Per-item substitution rows for the query: (B, Lq, N_CODES).
    sub_q = sub[q]  # gather

    # Reversed, padded targets so each diagonal's target codes are a
    # contiguous slice: for diagonal k, t[k - i] for i = 0..Lq-1 equals
    # t_rp[Lt - 1 - k + (Lq - 1) + i].
    pad_code = jnp.full((B, Lq), N_CODES - 1, dtype=q.dtype)
    t_rp = jnp.concatenate([pad_code[:, : Lq - 1] if Lq > 1 else
                            pad_code[:, :0], t[:, ::-1], pad_code], axis=1)

    zeros_f = jnp.zeros((B, Lq), jnp.float32)
    zeros_i = jnp.zeros((B, Lq), jnp.int32)

    n_codes = sub.shape[0]
    code_iota = jnp.arange(n_codes, dtype=jnp.int32)

    def step(carry, k):
        (h1, h2, e1, f1, mh1, mh2, me1, mf1, lh1, lh2, le1, lf1,
         best, bm, bl, bi) = carry
        # target codes along diagonal k (ascending in query index i)
        start = Lt - 1 - k + (Lq - 1)
        td = jax.lax.dynamic_slice(t_rp, (0, start), (B, Lq))
        # substitution scores via one-hot contraction (a per-step
        # gather serializes badly on TPU; compare+select runs on the
        # VPU at full width)
        onehot = (td[..., None].astype(jnp.int32) ==
                  code_iota[None, None, :]).astype(sub_q.dtype)
        s = jnp.sum(sub_q * onehot, axis=2)

        # shift "i-1" quantities down by one row (prepend edge state 0)
        def sh(x, fill):
            return jnp.concatenate(
                [jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

        h2s, mh2s, lh2s = sh(h2, 0.0), sh(mh2, 0), sh(lh2, 0)
        h1s, mh1s, lh1s = sh(h1, 0.0), sh(mh1, 0), sh(lh1, 0)
        f1s, mf1s, lf1s = sh(f1, NEG), sh(mf1, 0), sh(lf1, 0)

        # E: gap in query (consumes target): from (i, j-1)
        e_open = h1 - open_cost
        e_ext = e1 - ext_cost
        e = jnp.maximum(e_open, e_ext)
        from_open = e_open >= e_ext
        me = jnp.where(from_open, mh1, me1)
        le = jnp.where(from_open, lh1, le1) + 1

        # F: gap in target (consumes query): from (i-1, j)
        f_open = h1s - open_cost
        f_ext = f1s - ext_cost
        f = jnp.maximum(f_open, f_ext)
        f_from_open = f_open >= f_ext
        mf = jnp.where(f_from_open, mh1s, mf1s)
        lf = jnp.where(f_from_open, lh1s, lf1s) + 1

        # H: diagonal match/mismatch vs gaps vs restart
        diag = h2s + s
        is_match = (q == td).astype(jnp.int32)
        mdiag = mh2s + is_match
        ldiag = lh2s + 1

        h = jnp.maximum(jnp.maximum(diag, e), jnp.maximum(f, 0.0))
        mh = jnp.where(h == diag, mdiag,
                       jnp.where(h == e, me, jnp.where(h == f, mf, 0)))
        lh = jnp.where(h == diag, ldiag,
                       jnp.where(h == e, le, jnp.where(h == f, lf, 0)))
        mh = jnp.where(h <= 0.0, 0, mh)
        lh = jnp.where(h <= 0.0, 0, lh)

        # running best (per item, argmax over cells of this diagonal);
        # selection via one-hot row masks (per-step gathers serialize)
        row_best = jnp.max(h, axis=1)
        row_arg = jnp.argmax(h, axis=1).astype(jnp.int32)
        improved = row_best > best
        rowmask = jnp.arange(Lq, dtype=jnp.int32)[None, :] == \
            row_arg[:, None]
        sel_m = jnp.sum(jnp.where(rowmask, mh, 0), axis=1)
        sel_l = jnp.sum(jnp.where(rowmask, lh, 0), axis=1)
        best = jnp.where(improved, row_best, best)
        bm = jnp.where(improved, sel_m, bm)
        bl = jnp.where(improved, sel_l, bl)
        bi = jnp.where(improved, row_arg + (k << 16), bi)

        carry = (h, h1, e, f, mh, mh1, me, mf, lh, lh1, le, lf,
                 best, bm, bl, bi)
        return carry, None

    init = (zeros_f, zeros_f, zeros_f + NEG, zeros_f + NEG,
            zeros_i, zeros_i, zeros_i, zeros_i,
            zeros_i, zeros_i, zeros_i, zeros_i,
            jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
    carry, _ = jax.lax.scan(step, init, jnp.arange(Lq + Lt - 1))
    best, bm, bl, bi = carry[12], carry[13], carry[14], carry[15]
    q_end = bi & 0xFFFF
    t_end = (bi >> 16) - q_end
    return {"score": best, "matches": bm, "length": bl,
            "q_end": q_end, "t_end": t_end}


def sw_impl() -> str:
    """Which SW implementation production dispatch selects.  The r4
    row-scan Pallas kernel (ops/pallas_sw.py: MXU-built score slabs +
    Kogge-Stone row-gap scan, int32 DP) replaced the r3 wavefront that
    lost to this scan; default is pallas on the real chip, scan on CPU
    (interpret mode is test-only).  Pin with PEPR_SW_IMPL=scan|pallas."""
    import os

    impl = os.environ.get("PEPR_SW_IMPL")
    if impl in ("scan", "pallas"):
        return impl
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "scan"
    return "pallas" if platform in ("tpu", "axon") else "scan"


def sw_align_batch_fast(q: jax.Array, t: jax.Array, sub: jax.Array,
                        gap_open: int = 11, gap_extend: int = 1) -> dict:
    """Production dispatch: the Pallas row-scan kernel on TPU
    (ops/pallas_sw.py), the XLA wavefront scan elsewhere.  Pin with
    PEPR_SW_IMPL=scan|pallas."""
    impl = sw_impl()
    # the Pallas kernel's packed score slab (tile, 128, Lq) int32 must
    # fit VMEM alongside the DP state; beyond Lq=2048 (both sequences
    # >2k residues — pairs are short-side-query oriented) use the scan
    if impl == "pallas" and gap_open > gap_extend >= 0 \
            and q.shape[1] <= 2048:
        from pepr_tpu.ops.pallas_sw import sw_align_batch_pallas
        return sw_align_batch_pallas(q, t, sub, gap_open=gap_open,
                                     gap_extend=gap_extend)
    return sw_align_batch(q, t, sub, gap_open=gap_open,
                          gap_extend=gap_extend)


def sw_align_numpy(q: np.ndarray, t: np.ndarray, sub: np.ndarray,
                   gap_open: int = 11, gap_extend: int = 1) -> dict:
    """Plain-python reference implementation (test oracle)."""
    Lq, Lt = len(q), len(t)
    H = np.zeros((Lq + 1, Lt + 1))
    E = np.full((Lq + 1, Lt + 1), NEG)
    F = np.full((Lq + 1, Lt + 1), NEG)
    M = np.zeros((Lq + 1, Lt + 1), dtype=int)  # matches on path
    L = np.zeros((Lq + 1, Lt + 1), dtype=int)
    ME = np.zeros((Lq + 1, Lt + 1), dtype=int)
    LE = np.zeros((Lq + 1, Lt + 1), dtype=int)
    MF = np.zeros((Lq + 1, Lt + 1), dtype=int)
    LF = np.zeros((Lq + 1, Lt + 1), dtype=int)
    best, bm, bl, bqe, bte = 0.0, 0, 0, 0, 0
    for i in range(1, Lq + 1):
        for j in range(1, Lt + 1):
            eo, ee = H[i, j - 1] - gap_open, E[i, j - 1] - gap_extend
            E[i, j] = max(eo, ee)
            if eo >= ee:
                ME[i, j], LE[i, j] = M[i, j - 1], L[i, j - 1] + 1
            else:
                ME[i, j], LE[i, j] = ME[i, j - 1], LE[i, j - 1] + 1
            fo, fe = H[i - 1, j] - gap_open, F[i - 1, j] - gap_extend
            F[i, j] = max(fo, fe)
            if fo >= fe:
                MF[i, j], LF[i, j] = M[i - 1, j], L[i - 1, j] + 1
            else:
                MF[i, j], LF[i, j] = MF[i - 1, j], LF[i - 1, j] + 1
            d = H[i - 1, j - 1] + sub[q[i - 1], t[j - 1]]
            h = max(0.0, d, E[i, j], F[i, j])
            H[i, j] = h
            if h <= 0:
                M[i, j] = L[i, j] = 0
            elif h == d:
                M[i, j] = M[i - 1, j - 1] + int(q[i - 1] == t[j - 1])
                L[i, j] = L[i - 1, j - 1] + 1
            elif h == E[i, j]:
                M[i, j], L[i, j] = ME[i, j], LE[i, j]
            else:
                M[i, j], L[i, j] = MF[i, j], LF[i, j]
            if h > best:
                best, bm, bl = h, M[i, j], L[i, j]
                bqe, bte = i - 1, j - 1
    return {"score": best, "matches": bm, "length": bl,
            "q_end": bqe, "t_end": bte}
