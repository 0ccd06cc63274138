"""Gene-wise jackknife branch supports.

Reference behavior: PhylogenomicPipeline2.buildConcatenatedTreeWith
GeneWiseJackKnifeSupport (PhylogenomicPipeline2.java:994-1126): the
full tree is built from the whole concatenated alignment (default ML);
each of `reps` (default 100) support trees is built with FastTree from
a random half of the gene families (RandomSetUtils.getRandomSet,
sampling without replacement); supports are bipartition match counts
(TreeSupportDecorator).

TPU-first: a jackknife replicate is just a 0/1 site-weight vector over
the same concatenated alignment — the likelihood kernel reweights
sites, so replicates reuse identical device shapes (no re-extraction,
no RAM throttling: PhylogenomicPipeline2.java:1011-1083's RAM models
are unnecessary under static HBM planning).
"""

from __future__ import annotations

import numpy as np

from pepr_tpu.models.concat import ConcatenatedAlignment
from pepr_tpu.models.treebuild import ml_tree, nj_tree
from pepr_tpu.ops.likelihood import WagModel
from pepr_tpu.tree import decorate_supports
from pepr_tpu.tree.basic import Tree


def jackknife_mask(cat: ConcatenatedAlignment, rep_idx: int, seed: int,
                   fraction: float = 0.5) -> np.ndarray:
    """(L,) float32 site-weight mask for one replicate: a random
    `fraction` of gene families sampled without replacement
    (PhylogenomicPipeline2.java:959-977: geneCount/2 genes).  Seeded
    per (seed, rep) so replicates are independent AND individually
    reproducible — resuming a checkpointed run regenerates identical
    masks."""
    rng = np.random.default_rng([seed, rep_idx])
    G = cat.n_genes
    k = max(int(G * fraction), 1)
    genes = rng.choice(G, size=k, replace=False)
    return cat.gene_column_mask(genes).astype(np.float32)


def jackknife_gene_masks(cat: ConcatenatedAlignment, reps: int, seed: int,
                         fraction: float = 0.5) -> np.ndarray:
    return np.stack([jackknife_mask(cat, r, seed, fraction)
                     for r in range(reps)])


def bootstrap_weights(length: int, rep_idx: int, seed: int) -> np.ndarray:
    """(L,) float32 multinomial column-resampling weights — the
    classic bootstrap (SequenceAlignment.java:994-1027 resamples
    columns with replacement; as site weights the resample is a pure
    reweighting of the same computation)."""
    rng = np.random.default_rng([seed, rep_idx, 7])
    counts = rng.multinomial(length, np.full(length, 1.0 / length))
    return counts.astype(np.float32)


def support_tree_single(cat: ConcatenatedAlignment, rep_idx: int,
                        seed: int, *, model: WagModel | None = None,
                        method: str = "fast_ml", fraction: float = 0.5,
                        nni_rounds: int = 2, bl_steps: int = 60,
                        resample: str = "jackknife_genes") -> Tree:
    """One support-tree replicate (a single unit of the reference's
    GeneSubsetTreeRunnable fan-out, PhylogenomicPipeline2.java:
    1546-1633).  `resample` picks gene-wise jackknife (the pipeline
    default) or classic site bootstrap."""
    if model is None:
        model = WagModel.create()
    if resample == "bootstrap_sites":
        w = bootstrap_weights(cat.length, rep_idx, seed)
    else:
        w = jackknife_mask(cat, rep_idx, seed, fraction)
    if method == "nj":
        return nj_tree(cat.mat, cat.taxa, site_weights=w)
    tree, _ = ml_tree(cat.mat, cat.taxa, model, site_weights=w,
                      nni_rounds=nni_rounds, bl_steps=bl_steps,
                      bl_refine_steps=max(bl_steps // 2, 20),
                      spr_rounds=0)  # NNI-only, like the batched path
    return tree


def support_trees(cat: ConcatenatedAlignment, reps: int, seed, *,
                  model: WagModel | None = None, method: str = "fast_ml",
                  fraction: float = 0.5, nni_rounds: int = 2,
                  bl_steps: int = 60, store=None, deadline=None,
                  on_progress=None, resample: str = "jackknife_genes",
                  batched: bool = True) -> list[Tree]:
    """Build `reps` jackknife support trees.

    Default path is the batched replicate fan-out over the device mesh
    (support_trees_batched); `batched=False` keeps the serial
    one-replicate-at-a-time path (also the fallback for non-fast_ml
    methods), checkpointing each replicate and stopping at a deadline
    (resumable)."""
    from pepr_tpu.tree import parse_newick, to_newick

    if isinstance(seed, np.random.Generator):  # legacy call style
        seed = int(seed.integers(1 << 31))
    if model is None:
        model = WagModel.create()
    if batched and method in ("ml", "fast_ml") and reps > 1:
        return support_trees_batched(
            cat, reps, seed, model=model, fraction=fraction,
            nni_rounds=nni_rounds, bl_steps=bl_steps, store=store,
            deadline=deadline, on_progress=on_progress, resample=resample)
    out: list[Tree] = []
    for r in range(reps):
        key = f"support_{r:04d}"
        if store is not None and store.has(key):
            out.append(parse_newick(store.load(key)))
            continue
        if deadline is not None and deadline.expired:
            from pepr_tpu.pipeline.checkpoint import Incomplete
            raise Incomplete(f"support tree {r}/{reps}")
        tree = support_tree_single(cat, r, seed, model=model,
                                   method=method, fraction=fraction,
                                   nni_rounds=nni_rounds,
                                   bl_steps=bl_steps, resample=resample)
        if store is not None:
            store.save(key, to_newick(tree))
        if on_progress is not None:
            on_progress(r)
        out.append(tree)
    return out


def support_trees_batched(cat: ConcatenatedAlignment, reps: int,
                          seed: int, *, model: WagModel | None = None,
                          fraction: float = 0.5, nni_rounds: int = 2,
                          bl_steps: int = 60, store=None, deadline=None,
                          on_progress=None,
                          resample: str = "jackknife_genes",
                          max_rounds: int | None = None) -> list[Tree]:
    """All replicates at once over the device mesh — the TPU-native
    replacement for the reference's RAM-throttled jackknife thread pool
    (PhylogenomicPipeline2.java:1039-1099).

    Per-replicate NJ starting topologies are host work; branch-length
    optimization of ALL replicates is one sharded computation
    (parallel.mesh.sharded_replicate_blopt: replicates over the 'rep'
    mesh axis, sites over 'site'), and each NNI round scores every
    replicate's full candidate neighborhood in fixed-shape device
    batches with per-candidate site-weight masks.  Checkpointing is at
    phase granularity (starts / each NNI round), resuming mid-run.
    """
    import logging

    import jax.numpy as jnp

    from pepr_tpu.models.treebuild import (_nni_candidate, _nni_moves,
                                           _score_topologies_w,
                                           nj_start_tree, tree_to_arrays,
                                           arrays_to_tree)
    from pepr_tpu.ops.likelihood import TreeArrays, _norm_chunk
    from pepr_tpu.parallel.mesh import default_mesh, sharded_replicate_blopt
    from pepr_tpu.tree import parse_newick, to_newick

    log = logging.getLogger("pepr_tpu")
    if model is None:
        model = WagModel.create()

    # already finished? (per-replicate keys, shared with the serial path)
    if store is not None and all(store.has(f"support_{r:04d}")
                                 for r in range(reps)):
        return [parse_newick(store.load(f"support_{r:04d}"))
                for r in range(reps)]

    def check(stage: str):
        if deadline is not None and deadline.expired:
            from pepr_tpu.pipeline.checkpoint import Incomplete
            raise Incomplete(stage)

    if resample == "bootstrap_sites":
        masks = np.stack([bootstrap_weights(cat.length, r, seed)
                          for r in range(reps)])
    else:
        masks = jackknife_gene_masks(cat, reps, seed, fraction)

    # phase 1: per-replicate NJ starting topologies (host)
    def _starts():
        out = []
        for r in range(reps):
            out.append(to_newick(nj_start_tree(cat.mat, cat.taxa,
                                               masks[r])))
        return out
    start_nwks = store.cached("support_starts", _starts) \
        if store is not None else _starts()
    arrs = [tree_to_arrays(parse_newick(nwk), cat.taxa)
            for nwk in start_nwks]
    children = np.stack([a.children for a in arrs])  # (R, n_int, 3)
    blens = np.stack([a.blen for a in arrs])  # (R, n_nodes)
    check("support starts")

    mesh = default_mesh()
    n_leaves = len(cat.taxa)
    margs = (jnp.asarray(model.eig), jnp.asarray(model.u),
             jnp.asarray(model.u_inv), jnp.asarray(model.pi),
             jnp.asarray(model.rates))
    codes_d = jnp.asarray(np.asarray(cat.mat, np.int8))
    site_chunk = _norm_chunk(cat.length, 4096)

    # phase 2 + 3: joint BL-opt, then NNI rounds (state checkpointed)
    state_key = "support_batch_state"
    state = store.load(state_key) if store is not None \
        and store.has(state_key) else None
    if state is not None:
        children, blens, lls, round_done = state
    else:
        # per-block checkpointing: block wall time scales with
        # reps x sites x NODES, so size blocks to ~ a few minutes each
        # — a block that outlives the run slice loses all its work.
        # Calibration point: 16 reps x ~40k live columns x 23 nodes
        # (the r4 ery run) ~= 3-4 min on the tunneled chip; the node
        # factor was missing until the 52-taxon scale run produced
        # 12-minute blocks that could never finish inside a slice.
        live = int((masks[0] > 0).sum()) if reps else cat.length
        n_nodes_b = 2 * n_leaves - 1
        block = max(2, min(16, int(16 * 40000 * 23
                                   / max(live * n_nodes_b, 1)) & ~1))
        blk_key = "support_blopt_blocks"
        bstate: dict = store.load(blk_key) if store is not None \
            and store.has(blk_key) else {}
        lls = np.zeros(reps)
        last_block = 0.0
        b0 = 0
        while b0 < reps:
            if b0 in bstate:  # done under any (possibly older) block size
                b0 += len(bstate[b0][0])
                continue
            check("support BL-opt")
            if deadline is not None and last_block > 0.0 and \
                    deadline.remaining() < 1.1 * last_block:
                # a block takes minutes; starting one that cannot
                # finish inside the slice wastes the whole block
                from pepr_tpu.pipeline.checkpoint import Incomplete
                raise Incomplete("support BL-opt (block won't fit)")
            import time as _time
            _t0 = _time.time()
            bl, ll = sharded_replicate_blopt(
                mesh, cat.mat, masks[b0:b0 + block],
                children[b0:b0 + block], blens[b0:b0 + block], model,
                steps=bl_steps)
            last_block = _time.time() - _t0
            bstate[b0] = (bl, ll)
            if store is not None:
                store.save(blk_key, bstate)
            log.info("support: BL-opt block %d-%d/%d done", b0,
                     b0 + len(bl) - 1, reps)
            b0 += len(bl)
        for b0, (bl, ll) in bstate.items():
            blens[b0:b0 + len(bl)] = bl
            lls[b0:b0 + len(ll)] = ll
        round_done = 0
        if store is not None:
            store.save(state_key, (children, blens, lls, round_done))
        log.info("support: batched BL-opt of %d replicates done", reps)
    check("support BL-opt")

    # run until no replicate improves, FastTree-style round cap
    # (~4*log2(N)); nni_rounds acts as a floor, not the budget — r3's
    # ery run showed 94/100 replicates still moving when the old
    # fixed-2-round loop stopped
    if max_rounds is None:
        max_rounds = max(nni_rounds,
                         4 * int(np.ceil(np.log2(max(n_leaves, 4)))))
    for rnd in range(round_done, max_rounds):
        # build every replicate's NNI neighborhood
        cand_children, cand_blen, cand_w, cand_rep = [], [], [], []
        per_rep_moves: list[list] = []
        for r in range(reps):
            moves = _nni_moves(children[r], n_leaves)
            per_rep_moves.append(moves)
            for m in moves:
                f, nb = _nni_candidate(children[r], blens[r], n_leaves,
                                       [m])
                cand_children.append(f)
                cand_blen.append(nb)
                cand_w.append(masks[r])
                cand_rep.append(r)
        # resumable candidate scoring: a full round at 50-genome scale
        # is tens of minutes of device dispatches — far beyond one
        # tunnel-safe run slice — so per-dispatch results checkpoint
        # under a per-round key and a near-deadline run exits cleanly
        scores = np.zeros(len(cand_children))
        batch = 16
        pad_to = min(batch, len(cand_children))
        sc_key = f"support_nni_scores_{rnd}"
        sstate: dict = store.load(sc_key) if store is not None \
            and store.has(sc_key) else {}
        import time as _time
        last_sc_save = _time.time()
        for c0 in range(0, len(cand_children), batch):
            if c0 in sstate:
                got = sstate[c0]
                scores[c0:c0 + len(got)] = got
                continue
            if deadline is not None and deadline.near(60.0):
                if store is not None:
                    store.save(sc_key, sstate)
                from pepr_tpu.pipeline.checkpoint import Incomplete
                raise Incomplete(f"support NNI scoring round {rnd}")
            cb = cand_children[c0:c0 + batch]
            bb = cand_blen[c0:c0 + batch]
            wb = cand_w[c0:c0 + batch]
            n_real = len(cb)
            while len(cb) < pad_to:
                cb, bb, wb = cb + [cb[-1]], bb + [bb[-1]], wb + [wb[-1]]
            from pepr_tpu.ops.likelihood import forward_impl
            s = _score_topologies_w(
                codes_d, jnp.asarray(np.stack(cb)),
                jnp.asarray(np.stack(bb)), *margs,
                jnp.asarray(np.stack(wb)), chunk=site_chunk,
                impl=forward_impl(codes_d.shape[0] + cb[0].shape[0]))
            got = np.asarray(s)[:n_real]
            scores[c0:c0 + n_real] = got
            sstate[c0] = got
            if store is not None and _time.time() - last_sc_save > 60.0:
                store.save(sc_key, sstate)
                last_sc_save = _time.time()
        # accept per replicate: all improving non-conflicting moves
        cand_rep = np.array(cand_rep)
        new_children = children.copy()
        moved: list[int] = []
        pos = 0
        for r in range(reps):
            k = len(per_rep_moves[r])
            r_scores = scores[pos:pos + k]
            pos += k
            improving = np.nonzero(r_scores > lls[r] + 1e-4)[0]
            if len(improving) == 0:
                continue
            taken, touched = [], set()
            for idx in improving[np.argsort(-r_scores[improving])]:
                k_c, k_p, kid, z = per_rep_moves[r][int(idx)]
                if {k_c, k_p} & touched:
                    continue
                touched |= {k_c, k_p}
                taken.append(per_rep_moves[r][int(idx)])
            fixed, nb = _nni_candidate(children[r], blens[r], n_leaves,
                                       taken)
            blens[r] = nb
            new_children[r] = fixed
            moved.append(r)
        children = new_children
        if not moved:
            log.info("support: NNI converged after round %d", rnd)
            break
        # re-optimize branch lengths of the MOVED replicates only (a
        # late round moves a handful; re-running all 100 wasted ~90%
        # of the round's device time).  Blocked + checkpointed like
        # phase 2: an early round can move every replicate, which is
        # tens of minutes of device time at 50-genome scale (the
        # round replays deterministically up to here on resume — the
        # candidate scores are cached under the per-round key)
        live_m = int((masks[0] > 0).sum()) if reps else cat.length
        block_m = max(2, min(16, int(16 * 40000 * 23
                                     / max(live_m * (2 * n_leaves - 1),
                                           1)) & ~1))
        mv_key = f"support_moved_blopt_{rnd}"
        mstate: dict = store.load(mv_key) if store is not None \
            and store.has(mv_key) else {}
        for m0 in range(0, len(moved), block_m):
            if m0 in mstate:
                continue
            if deadline is not None and deadline.near(60.0):
                if store is not None:
                    store.save(mv_key, mstate)
                from pepr_tpu.pipeline.checkpoint import Incomplete
                raise Incomplete(f"support moved-BL-opt round {rnd}")
            sel = moved[m0:m0 + block_m]
            mb, ml = sharded_replicate_blopt(
                mesh, cat.mat, masks[sel], children[sel], blens[sel],
                model, steps=max(bl_steps // 2, 20))
            mstate[m0] = (mb, ml)
            if store is not None:
                store.save(mv_key, mstate)
        for m0, (mb, ml) in mstate.items():
            sel = moved[m0:m0 + block_m]
            blens[sel] = mb[:len(sel)]
            lls[sel] = ml[:len(sel)]
        if store is not None:
            store.save(state_key, (children, blens, lls, rnd + 1))
        log.info("support: NNI round %d moved %d/%d replicates", rnd,
                 len(moved), reps)
        if rnd == max_rounds - 1:
            log.warning("support: NNI round cap %d hit with %d "
                        "replicates still moving", max_rounds, len(moved))
        check(f"support NNI round {rnd}")

    trees = []
    for r in range(reps):
        arr = TreeArrays(children[r], blens[r],
                         arrs[r].node_of_tree_node, list(cat.taxa))
        tree = arrays_to_tree(arr)
        trees.append(tree)
        if store is not None:
            store.save(f"support_{r:04d}", to_newick(tree))
        if on_progress is not None:
            on_progress(r)
    return trees


def decorated_tree(full_tree: Tree, reps_trees: list[Tree]) -> Tree:
    """Support counts written onto the full tree
    (TreeSupportDecorator.java:86-163)."""
    return decorate_supports(full_tree, reps_trees)
