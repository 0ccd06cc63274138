import numpy as np
import pytest
import jax.numpy as jnp

from pepr_tpu.alphabet import PAD, encode
from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.models.hmm_enhancer import (consensus_sequence,
                                          enhance_homolog_groups)
from pepr_tpu.ops.hmm import (ProfileHMM, build_profile_hmm, pack_profiles,
                              profile_score_pairs, viterbi_score_batch)

NEG = -1e30


def viterbi_numpy(seq, hmm: ProfileHMM):
    """Oracle with the same Plan7 local recurrences."""
    M = hmm.length
    e = hmm.match_logodds
    entry = -np.log2(M)
    vm = np.full(M, NEG)
    vi = np.full(M, NEG)
    vd = np.full(M, NEG)
    total = NEG
    for c in seq:
        new_vm = np.full(M, NEG)
        for k in range(M):
            best = entry
            if k > 0:
                best = max(best, vm[k - 1] + hmm.log_tmm[k - 1],
                           vi[k - 1] + hmm.log_tim[k - 1],
                           vd[k - 1] + hmm.log_tdm[k - 1])
            emit = 0.0 if c >= 20 else e[k, c]
            new_vm[k] = emit + best
        new_vi = np.maximum(vm + hmm.log_tmi[:M], vi + hmm.log_tii[:M])
        new_vd = np.full(M, NEG)
        for k in range(1, M):
            new_vd[k] = max(new_vm[k - 1] + hmm.log_tmd[k - 1],
                            new_vd[k - 1] + hmm.log_tdd[k - 1])
        vm, vi, vd = new_vm, new_vi, new_vd
        total = max(total, vm.max())
    return total


def _family(rng, n=6, L=60, rate=0.1):
    base = rng.integers(0, 20, size=L).astype(np.int8)
    seqs = []
    for _ in range(n):
        s = base.copy()
        m = rng.random(L) < rate
        s[m] = rng.integers(0, 20, size=m.sum())
        seqs.append(s)
    return base, seqs


def test_build_profile_emissions(rng):
    base, seqs = _family(rng)
    aln = np.stack(seqs)  # already same length, no gaps
    hmm = build_profile_hmm(aln)
    assert hmm.length == aln.shape[1]
    # consensus residue should have the max log-odds in most columns
    hits = sum(1 for k in range(hmm.length)
               if hmm.match_logodds[k].argmax() == base[k])
    assert hits > hmm.length * 0.8


def forward_numpy(seq, hmm: ProfileHMM):
    """Forward oracle: same recurrences in the (logaddexp2, +) semiring."""
    def lae(*xs):
        m = max(xs)
        if m <= NEG:
            return NEG
        return m + np.log2(sum(2.0 ** (np.float64(x) - m) for x in xs))

    M = hmm.length
    e = hmm.match_logodds
    entry = -np.log2(M)
    vm = np.full(M, NEG)
    vi = np.full(M, NEG)
    vd = np.full(M, NEG)
    total = NEG
    for c in seq:
        new_vm = np.full(M, NEG)
        for k in range(M):
            best = entry
            if k > 0:
                best = lae(best, vm[k - 1] + hmm.log_tmm[k - 1],
                           vi[k - 1] + hmm.log_tim[k - 1],
                           vd[k - 1] + hmm.log_tdm[k - 1])
            emit = 0.0 if c >= 20 else e[k, c]
            new_vm[k] = emit + best
        new_vi = np.array([lae(vm[k] + hmm.log_tmi[k],
                               vi[k] + hmm.log_tii[k])
                           for k in range(M)])
        new_vd = np.full(M, NEG)
        for k in range(1, M):
            new_vd[k] = lae(new_vm[k - 1] + hmm.log_tmd[k - 1],
                            new_vd[k - 1] + hmm.log_tdd[k - 1])
        vm, vi, vd = new_vm, new_vi, new_vd
        total = lae(total, *vm)
    return total


def test_viterbi_matches_numpy_oracle(rng):
    base, seqs = _family(rng, n=5, L=24)
    hmm = build_profile_hmm(np.stack(seqs))
    test_seqs = [base,
                 rng.integers(0, 20, size=30).astype(np.int8),
                 np.concatenate([rng.integers(0, 20, 5).astype(np.int8),
                                 base[:15]])]
    pairs = [(i, 0) for i in range(len(test_seqs))]
    got = profile_score_pairs(test_seqs, [hmm], pairs,
                              algorithm="viterbi", null_per_col=0.0)
    for i, s in enumerate(test_seqs):
        want = viterbi_numpy(s, hmm)
        assert float(got[i]) == pytest.approx(want, rel=1e-4, abs=1e-3), i


def test_forward_matches_numpy_oracle():
    # local RNG: the shared session-scoped `rng` fixture's draw order
    # feeds later tests; a new consumer must not shift their stream
    rng = np.random.default_rng(77)
    base, seqs = _family(rng, n=5, L=24)
    hmm = build_profile_hmm(np.stack(seqs))
    test_seqs = [base,
                 rng.integers(0, 20, size=30).astype(np.int8),
                 np.concatenate([rng.integers(0, 20, 5).astype(np.int8),
                                 base[:15]])]
    pairs = [(i, 0) for i in range(len(test_seqs))]
    got = profile_score_pairs(test_seqs, [hmm], pairs,
                              algorithm="forward", null_per_col=0.0)
    for i, s in enumerate(test_seqs):
        want = forward_numpy(s, hmm)
        assert float(got[i]) == pytest.approx(want, rel=1e-3, abs=0.05), i
        # Forward >= Viterbi always (sum over paths vs best path)
        assert float(got[i]) >= viterbi_numpy(s, hmm) - 1e-3


def test_member_scores_higher_than_random(rng):
    base, seqs = _family(rng, L=80)
    hmm = build_profile_hmm(np.stack(seqs))
    member = seqs[0]
    junk = rng.integers(0, 20, size=80).astype(np.int8)
    got = profile_score_pairs([member, junk], [hmm], [(0, 0), (1, 0)])
    assert got[0] > 100
    assert got[0] > got[1] + 50


def test_consensus_sequence():
    aln = np.array([[0, 1, 23, 2],
                    [0, 1, 23, 3],
                    [0, 4, 23, 2]], dtype=np.int8)
    cons = consensus_sequence(aln)
    assert list(cons) == [0, 1, 2]  # gap column dropped


def test_enhancer_selects_outgroup_and_extends_sets(rng):
    # families shared by 3 ingroup genomes; OG1 carries close homologs,
    # OG2 carries junk
    n_fam, L = 4, 90
    bases = [rng.integers(0, 20, size=L).astype(np.int8)
             for _ in range(n_fam)]

    def mutated(b, rate):
        s = b.copy()
        m = rng.random(L) < rate
        s[m] = rng.integers(0, 20, size=m.sum())
        return s

    ingroup = []
    for g in range(3):
        titles = [f"p{g}_{f} [InG{g}]" for f in range(n_fam)]
        seqs = [mutated(b, 0.1) for b in bases]
        ingroup.append(SequenceSet(f"InG{g}", titles, seqs))
    og1 = SequenceSet("OG1", [f"o1_{f} [OG1]" for f in range(n_fam)],
                      [mutated(b, 0.25) for b in bases])
    og2 = SequenceSet("OG2", [f"o2_{f} [OG2]" for f in range(n_fam)],
                      [rng.integers(0, 20, size=L).astype(np.int8)
                       for _ in range(n_fam)])

    hg_sets = []
    for f in range(n_fam):
        titles = [ingroup[g].titles[f] for g in range(3)]
        seqs = [ingroup[g].seqs[f] for g in range(3)]
        hg_sets.append(SequenceSet(f"set_{f}", titles, seqs))

    res = enhance_homolog_groups(hg_sets, ingroup, [og2, og1],
                                 outgroup_count=1, min_bits=50)
    assert res.selected_outgroups == ["OG1"]
    # each enhanced set should now contain the OG1 member
    for s in res.enhanced_sets:
        assert "OG1" in s.taxa
        assert len(set(s.taxa)) == len(s.taxa)  # one member per genome


def test_enhancer_rebuild_skips_equal_score_duplicates(rng):
    """HMMSetEnhancer.java:266-279 semantics: a repeated genome with an
    EQUAL score (duplicate gene copy) must not truncate the rebuild;
    a lower-scoring repeat (paralog) must."""
    from pepr_tpu.io.fasta import SequenceSet
    from pepr_tpu.models.hmm_enhancer import enhance_homolog_groups

    L = 60
    base = rng.integers(0, 20, size=L).astype(np.int8)

    def mut(rate):
        s = base.copy()
        m = rng.random(L) < rate
        s[m] = rng.integers(0, 20, m.sum())
        return s

    # genome 0 carries TWO IDENTICAL copies of the gene; genomes 1-2
    # carry diverged orthologs that score lower than either copy
    dup = mut(0.0)
    g0 = SequenceSet("g0", ["a [T0]", "b [T0]"], [dup, dup.copy()])
    g1 = SequenceSet("g1", ["c [T1]"], [mut(0.15)])
    g2 = SequenceSet("g2", ["d [T2]"], [mut(0.2)])
    hg = [SequenceSet("set_0", ["a [T0]", "c [T1]", "d [T2]"],
                      [dup, g1.seqs[0], g2.seqs[0]])]
    res = enhance_homolog_groups(hg, [g0, g1, g2], [],
                                 outgroup_count=0, min_bits=5.0)
    taxa = set(res.enhanced_sets[0].taxa)
    # the equal-score duplicate at ranks 1-2 must NOT truncate: all
    # three taxa present
    assert taxa == {"T0", "T1", "T2"}, taxa
