"""Batched profile-profile global alignment (affine Needleman-Wunsch).

The DP engine of the progressive MSA (muscle replacement,
MultipleSequenceAligner.java:90-206): profiles are (L, 20) residue
frequency columns; the column-pair score is the expected BLOSUM62 score
f1' B f2 (an MXU contraction), and the DP runs as an anti-diagonal
wavefront `lax.scan` emitting packed traceback pointers that the host
walks to produce the merge path.

Pointer byte layout per cell: bits 0-1 = winning state of H
(0=M diag, 1=E gap-in-profile-1, 2=F gap-in-profile-2); bit 2 = E came
from gap-open (else extend); bit 3 = F came from gap-open.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pepr_tpu.data.blosum62 import BLOSUM62

NEG = jnp.float32(-1e30)

PTR_M, PTR_E, PTR_F = 0, 1, 2
E_OPEN_BIT, F_OPEN_BIT = 4, 8


def blosum_core(dtype=np.float32) -> np.ndarray:
    """20x20 substitution core used for profile column scores."""
    return BLOSUM62[:20, :20].astype(dtype)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend",
                                             "term_scale", "packed"))
def nw_profile_batch(p1: jax.Array, p2: jax.Array, l1: jax.Array,
                     l2: jax.Array, gap_open: float = 11.0,
                     gap_extend: float = 1.0,
                     term_scale: float = 0.5, packed: bool = False,
                     core_matrix: jax.Array | None = None):
    """Global affine alignment of profile pairs.

    Args:
      p1: (B, L1, 20) float32/bfloat16 query profiles (frequency
          columns, zero-padded past l1; bf16 halves host->device bytes
          over the TPU tunnel, MXU contractions accumulate in f32).
      p2: (B, L2, 20) float32/bfloat16.
      l1, l2: (B,) int32 true lengths.
      term_scale: terminal gaps cost `term_scale` * normal (muscle-like
          soft terminal gap handling).
      packed: return pointers packed two cells per byte along the row
          axis (pointer values use 4 bits) — halves the device->host
          traceback transfer; unpack with `unpack_ptrs`.

    Returns:
      score: (B,) float32 at cell (l1, l2)
      ptr: (B, L1+L2+1, L1+1) uint8 pointers (diag k, row i), or
          (B, L1+L2+1, ceil((L1+1)/2)) when `packed`
    """
    B, L1, A = p1.shape
    L2 = p2.shape[1]
    R1 = L1 + 1

    go = jnp.float32(gap_open)
    ge = jnp.float32(gap_extend)
    core = jnp.asarray(blosum_core()) if core_matrix is None \
        else core_matrix

    # (B, 20, L2) substitution-transformed profile 2
    p2b = jnp.einsum("ab,njb->naj", core, p2,
                     preferred_element_type=jnp.float32)
    # reversed + padded along j so diagonal slices are contiguous:
    # for diag k, want p2b[:, :, (k-1) - i] for i = 0..L1 (cell (i+?,..))
    pad = jnp.zeros((B, A, R1), p2b.dtype)
    p2b_rp = jnp.concatenate([pad[:, :, : R1 - 1], p2b[:, :, ::-1], pad],
                             axis=2)

    rows = jnp.arange(R1)  # i index within a diagonal

    # terminal-gap discounting masks depend on true lengths
    l1b = l1.astype(jnp.int32)
    l2b = l2.astype(jnp.int32)

    def step(carry, k):
        h1, h2, e1, f1, score = carry  # previous diagonals, (B, R1)
        j = k - rows  # (R1,) target index for row i at this diag
        jb = jnp.broadcast_to(j[None, :], (B, R1))

        # substitution score for cell (i, j): profiles are 0-based,
        # cell (i, j) pairs residue i-1 with j-1.
        start = (L2 - 1) - (k - 1) + (R1 - 1)
        sl = jax.lax.dynamic_slice(p2b_rp, (0, 0, start), (B, A, R1))
        # sl[:, :, i] = p2b[:, :, (k-1) - i] = column j-1 for row i... but
        # we need row i paired with p1 row i-1 -> shift p1 by one.
        p1_shift = jnp.concatenate(
            [jnp.zeros((B, 1, A), p1.dtype), p1[:, : L1, :]], axis=1)
        s = jnp.einsum("nia,nai->ni", p1_shift, sl,
                       preferred_element_type=jnp.float32)

        def sh(x, fill):
            return jnp.concatenate(
                [jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

        h2s = sh(h2, NEG)
        h1s = sh(h1, NEG)
        f1s = sh(f1, NEG)

        valid = (jb >= 0) & (jb <= l2b[:, None]) & \
            (rows[None, :] <= l1b[:, None])

        # terminal gap scaling: gaps in row 0 / row l1 (E) and col 0 /
        # col l2 (F) are terminal
        e_term = (rows[None, :] == 0) | (rows[None, :] == l1b[:, None])
        f_term = (jb == 0) | (jb == l2b[:, None])
        go_e = jnp.where(e_term, go * term_scale, go)
        ge_e = jnp.where(e_term, ge * term_scale, ge)
        go_f = jnp.where(f_term, go * term_scale, go)
        ge_f = jnp.where(f_term, ge * term_scale, ge)

        m = h2s + s  # diagonal move into (i, j)
        e_open = h1 - go_e
        e_ext = e1 - ge_e
        e = jnp.maximum(e_open, e_ext)
        e_from_open = e_open >= e_ext
        f_open = h1s - go_f
        f_ext = f1s - ge_f
        f = jnp.maximum(f_open, f_ext)
        f_from_open = f_open >= f_ext

        h = jnp.maximum(jnp.maximum(m, e), f)
        state = jnp.where(h == m, PTR_M,
                          jnp.where(h == e, PTR_E, PTR_F)).astype(jnp.uint8)
        ptr = state | \
            jnp.where(e_from_open, jnp.uint8(E_OPEN_BIT), jnp.uint8(0)) | \
            jnp.where(f_from_open, jnp.uint8(F_OPEN_BIT), jnp.uint8(0))

        # origin cell (0, 0)
        at_origin = (k == 0) & (rows[None, :] == 0)
        h = jnp.where(at_origin, 0.0, h)
        h = jnp.where(valid, h, NEG)
        e = jnp.where(valid, e, NEG)
        f = jnp.where(valid, f, NEG)

        # capture the score when this diagonal crosses cell (l1, l2);
        # one-hot selection (per-step gathers serialize on TPU)
        at_target = k == (l1b + l2b)
        tmask = rows[None, :] == l1b[:, None]
        tgt = jnp.sum(jnp.where(tmask, h, 0.0), axis=1)
        score = jnp.where(at_target, tgt, score)

        return (h, h1, e, f, score), ptr

    init_h = jnp.full((B, R1), NEG)
    init = (init_h, init_h, init_h, init_h, jnp.full((B,), NEG))
    (_, _, _, _, score), ptrs = jax.lax.scan(
        step, init, jnp.arange(L1 + L2 + 1))
    ptrs = jnp.transpose(ptrs, (1, 0, 2))  # (B, diag, R1)
    if packed:
        if R1 % 2:
            ptrs = jnp.pad(ptrs, ((0, 0), (0, 0), (0, 1)))
        ptrs = ptrs[:, :, 0::2] | (ptrs[:, :, 1::2] << 4)
    return score, ptrs


def unpack_ptrs(packed: np.ndarray, R1: int) -> np.ndarray:
    """Host-side inverse of `packed=True`: (B, D, ceil(R1/2)) uint8 ->
    (B, D, R1)."""
    B, D, H = packed.shape
    out = np.empty((B, D, 2 * H), np.uint8)
    out[:, :, 0::2] = packed & 0xF
    out[:, :, 1::2] = packed >> 4
    return out[:, :, :R1]


def traceback(ptr: np.ndarray, l1: int, l2: int) -> list[tuple[int, int]]:
    """Walk packed pointers from (l1, l2) back to (0, 0).  Returns the
    path as a list of moves ('M' pairs both, 'E' consumes profile-2,
    'F' consumes profile-1) encoded as (di, dj) steps, in forward
    order."""
    i, j = l1, l2
    state = int(ptr[i + j, i]) & 3
    moves: list[tuple[int, int]] = []
    while i > 0 or j > 0:
        if i == 0:
            moves.append((0, 1))
            j -= 1
            continue
        if j == 0:
            moves.append((1, 0))
            i -= 1
            continue
        cell = int(ptr[i + j, i])
        if state == PTR_M:
            moves.append((1, 1))
            i -= 1
            j -= 1
            if i > 0 or j > 0:
                state = int(ptr[i + j, i]) & 3
        elif state == PTR_E:
            moves.append((0, 1))
            from_open = bool(cell & E_OPEN_BIT)
            j -= 1
            if from_open:
                state = int(ptr[i + j, i]) & 3
        else:  # PTR_F
            moves.append((1, 0))
            from_open = bool(cell & F_OPEN_BIT)
            i -= 1
            if from_open:
                state = int(ptr[i + j, i]) & 3
    return moves[::-1]


def nw_profile_numpy(p1: np.ndarray, p2: np.ndarray, gap_open=11.0,
                     gap_extend=1.0, term_scale=0.5) -> float:
    """Numpy oracle for the batch kernel's score (same recurrences)."""
    core = blosum_core(np.float64)
    l1, l2 = len(p1), len(p2)
    s = p1 @ core @ p2.T
    H = np.full((l1 + 1, l2 + 1), -1e30)
    E = np.full_like(H, -1e30)
    F = np.full_like(H, -1e30)
    H[0, 0] = 0.0
    for k in range(1, l1 + l2 + 1):
        for i in range(max(0, k - l2), min(k, l1) + 1):
            j = k - i
            e_term = i == 0 or i == l1
            f_term = j == 0 or j == l2
            goe = gap_open * (term_scale if e_term else 1.0)
            gee = gap_extend * (term_scale if e_term else 1.0)
            gof = gap_open * (term_scale if f_term else 1.0)
            gef = gap_extend * (term_scale if f_term else 1.0)
            if j >= 1:
                E[i, j] = max(H[i, j - 1] - goe, E[i, j - 1] - gee)
            if i >= 1:
                F[i, j] = max(H[i - 1, j] - gof, F[i - 1, j] - gef)
            m = H[i - 1, j - 1] + s[i - 1, j - 1] if (i >= 1 and j >= 1) \
                else -1e30
            H[i, j] = max(m, E[i, j], F[i, j])
    return H[l1, l2]
