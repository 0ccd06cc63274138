import numpy as np
import pytest
import jax.numpy as jnp

from pepr_tpu.alphabet import GAP, decode, encode
from pepr_tpu.models.concat import concatenate
from pepr_tpu.models.msa import (Alignment, _profile, align_families,
                                 align_family, upgma)
from pepr_tpu.ops.profile_align import (nw_profile_batch, nw_profile_numpy,
                                        traceback)
from pepr_tpu.ops.trim import (gblocks_mask, informative_mask,
                               min_steps_per_column, trim_gblocks)


def _strip_gaps(row: np.ndarray) -> np.ndarray:
    return row[row != GAP]


def test_nw_profile_score_matches_oracle(rng):
    for trial in range(3):
        l1, l2 = rng.integers(5, 40, size=2)
        p1 = rng.random((l1, 20)).astype(np.float32)
        p2 = rng.random((l2, 20)).astype(np.float32)
        p1 /= p1.sum(1, keepdims=True)
        p2 /= p2.sum(1, keepdims=True)
        P1 = np.zeros((1, 64, 20), np.float32)
        P2 = np.zeros((1, 64, 20), np.float32)
        P1[0, :l1] = p1
        P2[0, :l2] = p2
        score, ptrs = nw_profile_batch(jnp.asarray(P1), jnp.asarray(P2),
                                       jnp.asarray([l1], jnp.int32),
                                       jnp.asarray([l2], jnp.int32))
        want = nw_profile_numpy(p1, p2)
        assert float(score[0]) == pytest.approx(want, abs=0.02), trial


def test_traceback_is_valid_path(rng):
    l1, l2 = 20, 25
    p1 = rng.random((l1, 20)).astype(np.float32)
    p2 = rng.random((l2, 20)).astype(np.float32)
    P1 = np.zeros((1, 32, 20), np.float32)
    P2 = np.zeros((1, 32, 20), np.float32)
    P1[0, :l1] = p1
    P2[0, :l2] = p2
    score, ptrs = nw_profile_batch(jnp.asarray(P1), jnp.asarray(P2),
                                   jnp.asarray([l1], jnp.int32),
                                   jnp.asarray([l2], jnp.int32))
    moves = traceback(np.asarray(ptrs)[0], l1, l2)
    assert sum(m[0] for m in moves) == l1
    assert sum(m[1] for m in moves) == l2


def test_align_identical_sequences():
    s = encode("MKVLITGAGSGIGLAA")
    mat = align_family([s, s.copy(), s.copy()])
    assert mat.shape == (3, len(s))
    assert (mat == s[None, :]).all()


def test_align_with_insertion():
    a = encode("MKVLITGAGSGIGLEAAKRFLAEGA")
    b = encode("MKVLITGAGSGIGLEAAKRFLAEGA")
    c = encode("MKVLITGAGWWWWSGIGLEAAKRFLAEGA")  # 4-residue insertion
    mat = align_family([a, b, c])
    assert mat.shape[0] == 3
    # ungapped rows reproduce the inputs
    assert (_strip_gaps(mat[0]) == a).all()
    assert (_strip_gaps(mat[1]) == b).all()
    assert (_strip_gaps(mat[2]) == c).all()
    # a and b align identically
    assert (mat[0] == mat[1]).all()
    # total length = len(c) (insertion opens gaps in a, b)
    assert mat.shape[1] == len(c)
    assert (mat[0] == GAP).sum() == 4


def test_align_families_batched(rng):
    fams = []
    for f in range(5):
        base = rng.integers(0, 20, size=int(rng.integers(30, 60))).astype(np.int8)
        fam = []
        for k in range(4):
            s = base.copy()
            mask = rng.random(len(s)) < 0.1
            s[mask] = rng.integers(0, 20, size=mask.sum())
            fam.append(s)
        fams.append(fam)
    mats = align_families(fams)
    assert len(mats) == 5
    for fam, mat in zip(fams, mats):
        assert mat.shape[0] == len(fam)
        for r, s in enumerate(fam):
            assert (_strip_gaps(mat[r]) == s).all()


def test_align_families_chunked_resumes(rng, tmp_path):
    from pepr_tpu.models.msa import align_families_chunked
    from pepr_tpu.pipeline.checkpoint import CheckpointStore, Deadline, \
        Incomplete

    fams = []
    for f in range(7):
        base = rng.integers(0, 20, size=40).astype(np.int8)
        fams.append([base.copy() for _ in range(3)])
    ref = align_families(fams)

    store = CheckpointStore(str(tmp_path / "ck"))
    expired = Deadline(0.0)  # already expired: one chunk per call
    done = 0
    while True:
        try:
            mats = align_families_chunked(fams, store=store,
                                          deadline=expired, chunk=2)
            break
        except Incomplete:
            done += 1
    assert done == 3  # 7 families / chunk 2 -> 4 slices, 3 interrupts
    assert len(mats) == 7
    for a, b in zip(ref, mats):
        assert (a == b).all()


def test_upgma_merges_closest_first():
    d = np.array([[0, 1, 8, 8],
                  [1, 0, 8, 8],
                  [8, 8, 0, 2],
                  [8, 8, 2, 0]], dtype=float)
    merges = upgma(d)
    assert set(merges[0]) == {0, 1}
    assert set(merges[1]) == {2, 3}


def test_profile_frequencies():
    mat = np.array([[0, 1], [0, GAP]], dtype=np.int8)
    p = _profile(mat)
    assert p[0, 0] == pytest.approx(1.0)
    assert p[1, 1] == pytest.approx(0.5)
    assert p[1].sum() == pytest.approx(0.5)


def test_gblocks_conserved_block_kept(rng):
    # 10 sequences: 30 conserved columns, 12 noisy columns, 30 conserved
    n = 10
    cons1 = np.tile(rng.integers(0, 20, size=30).astype(np.int8), (n, 1))
    noise = rng.integers(0, 20, size=(n, 12)).astype(np.int8)
    cons2 = np.tile(rng.integers(0, 20, size=30).astype(np.int8), (n, 1))
    mat = np.concatenate([cons1, noise, cons2], axis=1)
    mask = gblocks_mask(mat)
    assert mask[:30].all()
    assert not mask[30:42].any()  # noisy stretch of 12 > b3=8 rejected
    assert mask[42:].all()


def test_gblocks_gap_rule():
    n = 10
    col = np.zeros((n, 40), dtype=np.int8)  # all-A conserved
    col[:6, 20] = GAP  # gaps in >half at column 20
    mask = gblocks_mask(col)
    assert not mask[20]
    assert mask[0] and mask[39]


def test_gblocks_small_block_dropped(rng):
    n = 10
    cons = np.tile(rng.integers(0, 20, size=5).astype(np.int8), (n, 1))
    noise = rng.integers(0, 20, size=(n, 20)).astype(np.int8)
    mat = np.concatenate([cons, noise], axis=1)
    mask = gblocks_mask(mat)
    assert not mask.any()  # 5-column block < b4=10


def test_min_steps_and_informative():
    mat = np.array([[0, 0, 1, GAP],
                    [0, 0, 1, GAP],
                    [0, 1, 2, 0],
                    [0, 1, 2, 0]], dtype=np.int8)
    steps = min_steps_per_column(mat)
    assert list(steps) == [0, 1, 1, 0]
    info = informative_mask(mat)
    # informative: >= 2 states each present in >= 2 sequences
    assert list(info) == [False, True, True, False]


def test_concatenate():
    a1 = Alignment("g1", ["T1", "T2"], np.array([[0, 1], [2, 3]], np.int8))
    a2 = Alignment("g2", ["T2", "T3"], np.array([[4, 5, 6], [7, 8, 9]],
                                                np.int8))
    cat = concatenate([a1, a2])
    assert cat.taxa == ["T1", "T2", "T3"]
    assert cat.length == 5
    assert list(cat.mat[0]) == [0, 1, GAP, GAP, GAP]
    assert list(cat.mat[1]) == [2, 3, 4, 5, 6]
    assert list(cat.spans[1]) == [2, 5]
    assert cat.presence.tolist() == [[True, True, False],
                                     [False, True, True]]
    mask = cat.gene_column_mask([1])
    assert list(mask) == [False, False, True, True, True]
    hs = cat.hs_matrix_text()
    assert "g1\t1\t1\t0" in hs


def test_refine_families_improves_or_keeps_sp(rng):
    from pepr_tpu.models.msa import (align_families, refine_families,
                                     sp_score)
    from pepr_tpu.tree import parse_newick
    from pepr_tpu.utils.simulate import simulate_alignment

    # families with indel-free homology; introduce length variation by
    # deleting random segments so alignment is non-trivial
    fams = []
    tree = parse_newick(
        "(((A:0.3,B:0.3):0.2,(C:0.3,D:0.3):0.2):0.1,(E:0.35,F:0.3):0.2);")
    for g in range(6):
        codes, taxa = simulate_alignment(tree, 120, rng)
        seqs = []
        for row in codes:
            row = row.copy()
            if rng.random() < 0.7:
                s0 = int(rng.integers(0, 100))
                ln = int(rng.integers(3, 15))
                row = np.concatenate([row[:s0], row[s0 + ln:]])
            seqs.append(row)
        fams.append(seqs)
    mats = align_families(fams)
    before = [sp_score(m) for m in mats]
    refined, n_imp = refine_families(mats, iters=2)
    after = [sp_score(m) for m in refined]
    for b, a in zip(before, after):
        assert a >= b  # acceptance is monotone in the objective
    # refined alignments still contain exactly the input residues
    for fam, m in zip(fams, refined):
        from pepr_tpu.alphabet import GAP
        for row, orig in zip(m, fam):
            assert (row[row != GAP] == orig).all()
