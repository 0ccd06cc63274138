"""Progressive multiple sequence alignment (muscle replacement).

Reference behavior replaced: MultipleSequenceAligner.java:90-141 (muscle
`-fasta -stable -quiet` per homolog group).  TPU-first design: UPGMA
guide tree over hashed k-mer cosine distances, then postorder
profile-profile merges through the batched affine-NW wavefront kernel
(ops/profile_align.py).  `align_families` schedules merges across many
gene families in level-synchronous waves so the device always sees full
batches of same-bucket DP problems.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from pepr_tpu.alphabet import GAP, N_AA
from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.ops.kmer_filter import kmer_profiles
from pepr_tpu.ops.profile_align import nw_profile_batch, traceback


def upgma(dist: np.ndarray) -> list[tuple[int, int]]:
    """UPGMA merge order on a condensed distance matrix.  Returns merge
    pairs referring to cluster ids (leaves 0..n-1, new clusters n+k).
    Vectorized (whole-matrix argmin + row/column average update per
    merge — the per-pair python loop was O(n^3) python ops)."""
    n = dist.shape[0]
    if n < 2:
        return []
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    size = np.ones(n)
    cid = np.arange(n)
    merges: list[tuple[int, int]] = []
    next_id = n
    for _ in range(n - 1):
        k = int(np.argmin(d))
        i, j = divmod(k, n)
        if i > j:
            i, j = j, i
        merges.append((int(cid[i]), int(cid[j])))
        new = (size[i] * d[i] + size[j] * d[j]) / (size[i] + size[j])
        d[i, :] = new
        d[:, i] = new
        d[i, i] = np.inf
        d[j, :] = np.inf
        d[:, j] = np.inf
        size[i] += size[j]
        cid[i] = next_id
        next_id += 1
    return merges


@dataclass
class _Cluster:
    rows: list[int]  # original sequence indices
    mat: np.ndarray  # (n_rows, L) int8 aligned codes


def _profile(mat: np.ndarray) -> np.ndarray:
    """(L, 20) frequency profile; gaps contribute zero mass (columns are
    normalized by total rows so gappy columns score low)."""
    n, L = mat.shape
    prof = np.zeros((L, N_AA), dtype=np.float32)
    for a in range(N_AA):
        prof[:, a] = (mat == a).sum(axis=0)
    prof /= max(n, 1)
    return prof


def _merge(a: _Cluster, b: _Cluster, moves: list[tuple[int, int]]) -> _Cluster:
    La, Lb = a.mat.shape[1], b.mat.shape[1]
    mv = np.asarray(moves, dtype=np.int64).reshape(-1, 2)
    cols = mv.shape[0]
    na = len(a.rows)
    out = np.full((na + len(b.rows), cols), GAP, dtype=np.int8)
    ia = np.cumsum(mv[:, 0]) - 1
    ib = np.cumsum(mv[:, 1]) - 1
    ca = mv[:, 0] == 1
    cb = mv[:, 1] == 1
    out[:na, ca] = a.mat[:, ia[ca]]
    out[na:, cb] = b.mat[:, ib[cb]]
    if not (ca.sum() == La and cb.sum() == Lb):
        raise ValueError(f"bad path: {ca.sum()}/{La} {cb.sum()}/{Lb}")
    return _Cluster(a.rows + b.rows, out)


def _pad_profiles(profs: list[np.ndarray], multiple: int = 64):
    lens = np.array([p.shape[0] for p in profs], dtype=np.int32)
    L = int(np.ceil(max(int(lens.max()), 1) / multiple) * multiple)
    out = np.zeros((len(profs), L, N_AA), dtype=np.float32)
    for i, p in enumerate(profs):
        out[i, : p.shape[0]] = p
    return out, lens


def align_families(families: list[list[np.ndarray]], *,
                   gap_open: float = 11.0, gap_extend: float = 1.0,
                   batch_size: int = 256,
                   length_multiple: int = 64,
                   core: np.ndarray | None = None,
                   guide_merges: list[list[tuple[int, int]]] | None = None
                   ) -> list[np.ndarray]:
    """Align many families; returns (n_i, L_i) int8 matrices.

    Merges across families are executed in waves: every family exposes
    its next ready merge, all ready merges are bucketed by padded
    profile lengths and run as batched device calls.

    `guide_merges` overrides the default k-mer-cosine UPGMA guide per
    family (refinement passes supply alignment-informed guides).
    """
    # per-family state: clusters + pending merge schedule
    states: list[dict] = []
    for fi, seqs in enumerate(families):
        n = len(seqs)
        clusters = {i: _Cluster([i], np.asarray(seqs[i],
                                                dtype=np.int8)[None, :])
                    for i in range(n)}
        if n == 1:
            states.append({"clusters": clusters, "merges": [], "next": 0})
            continue
        if guide_merges is not None:
            merges = guide_merges[fi]
        else:
            profs = kmer_profiles(seqs, dim=256)
            sims = np.clip(profs @ profs.T, 0.0, 1.0)
            dist = 1.0 - sims
            merges = upgma(dist)
        states.append({"clusters": clusters, "merges": merges, "next": 0})

    while True:
        # gather ready merges: (family, merge index)
        ready = []
        for fi, st in enumerate(states):
            k = st["next"]
            if k < len(st["merges"]):
                ci, cj = st["merges"][k]
                if ci in st["clusters"] and cj in st["clusters"]:
                    ready.append(fi)
        if not ready:
            break
        # build profile pairs
        jobs = []
        for fi in ready:
            st = states[fi]
            ci, cj = st["merges"][st["next"]]
            a, b = st["clusters"][ci], st["clusters"][cj]
            jobs.append((fi, ci, cj, a, b))
        profs1 = [_profile(j[3].mat) for j in jobs]
        profs2 = [_profile(j[4].mat) for j in jobs]

        # bucket by power-of-two padded length pair (compile discipline)
        def pl(p):
            x = max(p.shape[0], 1)
            return int(max(length_multiple,
                           2 ** int(np.ceil(np.log2(x)))))

        buckets: dict[tuple[int, int], list[int]] = {}
        for k, (pa, pb) in enumerate(zip(profs1, profs2)):
            buckets.setdefault((pl(pa), pl(pb)), []).append(k)

        # transfer discipline for the TPU tunnel: ship profiles bf16,
        # fetch pointers 2-cells-per-byte, keep a bounded window of
        # device calls in flight so host tracebacks overlap device DP
        import ml_dtypes
        from pepr_tpu.ops.profile_align import unpack_ptrs
        from pepr_tpu.utils.dispatch import BoundedDispatch
        dq = BoundedDispatch(window=4)

        def _consume(items):
            for (chunk, L1, l1v, l2v), (score, pk) in items:
                ptrs = unpack_ptrs(np.asarray(pk), L1 + 1)
                done: set[int] = set()
                for bi, k in enumerate(chunk):
                    if k in done:  # batch padding duplicates
                        continue
                    done.add(k)
                    fi, ci, cj, a, b = jobs[k]
                    moves = traceback(ptrs[bi], int(l1v[bi]), int(l2v[bi]))
                    st = states[fi]
                    merged = _merge(a, b, moves)
                    del st["clusters"][ci], st["clusters"][cj]
                    new_id = len(families[fi]) + st["next"]
                    st["clusters"][new_id] = merged
                    st["next"] += 1

        for (L1, L2), idxs in sorted(buckets.items()):
            for s0 in range(0, len(idxs), batch_size):
                chunk = idxs[s0:s0 + batch_size]
                # pad the batch dim to a power of two as well
                bpad = int(2 ** np.ceil(np.log2(max(len(chunk), 1))))
                chunk = chunk + [chunk[-1]] * (bpad - len(chunk))
                p1, l1 = _pad_profiles([profs1[k] for k in chunk],
                                       length_multiple)
                p2, l2 = _pad_profiles([profs2[k] for k in chunk],
                                       length_multiple)
                p1 = _fit(p1, L1).astype(ml_dtypes.bfloat16)
                p2 = _fit(p2, L2).astype(ml_dtypes.bfloat16)
                res = nw_profile_batch(
                    jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(l1),
                    jnp.asarray(l2), gap_open=gap_open,
                    gap_extend=gap_extend, packed=True,
                    core_matrix=None if core is None
                    else jnp.asarray(core))
                _consume(dq.submit((chunk, L1, l1, l2), res))
        _consume(dq.drain())

    out: list[np.ndarray] = []
    for fi, st in enumerate(states):
        (final,) = st["clusters"].values()
        # restore original row order ("-stable" muscle flag semantics:
        # output order == input order)
        order = np.argsort(final.rows)
        out.append(final.mat[order])
    return out


def _fit(arr: np.ndarray, L: int) -> np.ndarray:
    if arr.shape[1] == L:
        return arr
    out = np.zeros((arr.shape[0], L, arr.shape[2]), arr.dtype)
    out[:, : arr.shape[1]] = arr[:, :L] if arr.shape[1] > L else arr
    return out


def align_families_chunked(families: list[list[np.ndarray]], *,
                           store=None, deadline=None,
                           ckpt_key: str = "align_chunk",
                           chunk: int = 512,
                           **kw) -> list[np.ndarray]:
    """`align_families` in resumable slices.

    Families are aligned `chunk` at a time; each slice is persisted to
    the checkpoint store under `{ckpt_key}_{i}` so an interrupted run
    resumes at the first unfinished slice, and the deadline is polled
    between slices (the reference's align pools have no such
    affordance — PhylogenomicPipeline2.java:701-725 just runs to
    completion).  A chunk of hundreds of families still fills the
    device with full merge waves, so batching efficiency is kept.
    """
    import logging
    import time

    log = logging.getLogger("pepr_tpu")
    n = len(families)
    out: list[np.ndarray] = []
    for i, s0 in enumerate(range(0, n, chunk)):
        part = families[s0:s0 + chunk]
        t0 = time.time()
        if store is not None:
            key = f"{ckpt_key}_{i}"
            cached = store.has(key)
            mats = store.cached(key, lambda: align_families(part, **kw))
        else:
            cached, mats = False, align_families(part, **kw)
        out.extend(mats)
        if not cached:
            log.info("align: %d/%d families (%.1fs slice)",
                     min(s0 + chunk, n), n, time.time() - t0)
        # only pause after *fresh* work: replaying cached slices is
        # cheap and must make progress toward the first unfinished one
        if not cached and deadline is not None and deadline.expired \
                and s0 + chunk < n:
            from pepr_tpu.pipeline.checkpoint import Incomplete
            raise Incomplete("family alignment")
    return out


def sp_score(mat: np.ndarray, core: np.ndarray | None = None) -> float:
    """Sum-of-pairs BLOSUM score of the aligned residue pairs — the
    acceptance objective for refinement passes (muscle's refinement
    keeps a pass only when its objective improves).  Computed from
    per-column residue counts (L, 20): pairs_ab(col) = c_a c_b for
    a != b and C(c_a, 2) for a == b, so cost is O(L * 400) with no
    O(n^2) pair loop.  Gap-residue pairs are ignored (fewer matched
    residue pairs already penalizes spreading)."""
    from pepr_tpu.ops.profile_align import blosum_core
    sub = blosum_core(np.float64) if core is None \
        else np.asarray(core, np.float64)
    counts = np.zeros((mat.shape[1], N_AA), np.float64)
    for a in range(N_AA):
        counts[:, a] = (mat == a).sum(axis=0)
    cross = counts.T @ counts  # (20, 20) sum over columns of c_a c_b
    diag_pairs = ((counts * (counts - 1.0)) / 2.0).sum(axis=0)
    off = cross * (1.0 - np.eye(N_AA))
    return float((off * sub).sum() / 2.0
                 + (diag_pairs * np.diag(sub)).sum())


def refine_families(mats: list[np.ndarray], *, iters: int = 1,
                    core: np.ndarray | None = None,
                    **kw) -> tuple[list[np.ndarray], int]:
    """Muscle-style iterative refinement (the reference's muscle runs
    its default progressive build PLUS refinement passes,
    MultipleSequenceAligner.java:90-141; r4 shipped progressive-only).

    Each pass re-estimates every family's guide tree from the CURRENT
    alignment (Kimura-corrected distances over aligned columns — a
    device one-hot contraction, treebuild.protein_distances) instead
    of the pre-alignment k-mer cosines, re-aligns through the same
    batched NW merge waves, and keeps the new alignment only when its
    sum-of-pairs score improves.  Returns (mats, n_improved)."""
    from pepr_tpu.models.treebuild import protein_distances

    mats = list(mats)
    improved_total = 0
    for _ in range(max(iters, 0)):
        # degapped sequences + alignment-informed guide per family
        todo = [i for i, m in enumerate(mats) if m.shape[0] >= 3]
        if not todo:
            break
        fams = []
        guides = []
        for i in todo:
            m = mats[i]
            fams.append([row[row != GAP] for row in m])
            guides.append(upgma(protein_distances(m)))
        new = align_families(fams, guide_merges=guides, core=core, **kw)
        improved = 0
        for i, nm in zip(todo, new):
            if sp_score(nm, core) > sp_score(mats[i], core):
                mats[i] = nm
                improved += 1
        improved_total += improved
        if improved == 0:
            break
    return mats, improved_total


def align_family(seqs: list[np.ndarray], **kw) -> np.ndarray:
    return align_families([seqs], **kw)[0]


def align_sequence_sets(sets: list[SequenceSet], **kw) -> list["Alignment"]:
    mats = align_families([s.seqs for s in sets], **kw)
    return [Alignment(s.name, list(s.taxa), m, titles=list(s.titles))
            for s, m in zip(sets, mats)]


@dataclass
class Alignment:
    """An MSA with taxon names per row (SequenceAlignment.java role)."""
    name: str
    taxa: list[str]
    mat: np.ndarray  # (n, L) int8 with GAP
    titles: list[str] | None = None

    @property
    def n_seqs(self) -> int:
        return self.mat.shape[0]

    @property
    def length(self) -> int:
        return self.mat.shape[1]
