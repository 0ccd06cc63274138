import numpy as np
import pytest

from pepr_tpu.alphabet import decode, encode
from pepr_tpu.io.fasta import SequenceSet
from pepr_tpu.models.homology import (HitTable, ProteinUniverse,
                                      bidirectional_edges,
                                      cluster_homolog_groups,
                                      groups_to_sequence_sets,
                                      search_all_vs_all)
from pepr_tpu.ops.kmer_filter import candidate_pairs, kmer_profiles
from pepr_tpu.ops.mcl import connected_components, mcl_cluster


def _mutate(seq: np.ndarray, rng, rate: float) -> np.ndarray:
    s = seq.copy()
    mask = rng.random(len(s)) < rate
    s[mask] = rng.integers(0, 20, size=mask.sum())
    return s


def make_synthetic_genomes(rng, n_genomes=4, n_families=6, n_junk=3,
                           length=120, rate=0.15):
    """Genomes sharing mutated copies of `n_families` base proteins plus
    per-genome junk proteins."""
    bases = [rng.integers(0, 20, size=length).astype(np.int8)
             for _ in range(n_families)]
    genomes = []
    family_members = [[] for _ in range(n_families)]
    gidx = 0
    for g in range(n_genomes):
        titles, seqs = [], []
        for f, base in enumerate(bases):
            titles.append(f"g{g}_fam{f} protein [Taxon {g}]")
            seqs.append(_mutate(base, rng, rate))
            family_members[f].append(gidx)
            gidx += 1
        for j in range(n_junk):
            titles.append(f"g{g}_junk{j} junk [Taxon {g}]")
            seqs.append(rng.integers(0, 20, size=length).astype(np.int8))
            gidx += 1
        genomes.append(SequenceSet(f"g{g}", titles, seqs))
    return genomes, family_members


def test_kmer_profiles_similarity(rng):
    base = rng.integers(0, 20, size=200).astype(np.int8)
    near = _mutate(base, rng, 0.1)
    far = rng.integers(0, 20, size=200).astype(np.int8)
    p = kmer_profiles([base, near, far])
    sim_near = float(p[0] @ p[1])
    sim_far = float(p[0] @ p[2])
    assert sim_near > 0.5
    assert sim_far < 0.2
    assert np.allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-5)


def test_candidate_pairs_groups_by_genome(rng):
    seqs = [rng.integers(0, 20, size=100).astype(np.int8) for _ in range(10)]
    seqs[5] = seqs[0].copy()  # genome-2 copy of seq 0
    p = kmer_profiles(seqs)
    offsets = np.array([0, 5, 10])
    idx, sim = candidate_pairs(p, p, offsets, top_per_genome=1)
    assert idx.shape == (10, 2, 1)
    assert idx[0, 0, 0] == 0  # self is best in own genome
    assert idx[0, 1, 0] == 5  # identical copy is best in genome 2
    assert sim[0, 1, 0] == pytest.approx(1.0, abs=5e-3)


def test_exact_kmer_pairs_brute_force(rng):
    from pepr_tpu.ops.kmer_filter import exact_kmer_pairs
    seqs = [rng.integers(0, 22, size=rng.integers(3, 40)).astype(np.int8)
            for _ in range(12)]
    rows, codes = exact_kmer_pairs(seqs, k=3, alphabet_size=20)
    got = set(zip(rows.tolist(), codes.tolist()))
    want = set()
    for i, s in enumerate(seqs):
        for j in range(len(s) - 2):
            win = s[j:j + 3]
            if (win < 20).all():
                want.add((i, int(win[0]) * 400 + int(win[1]) * 20
                          + int(win[2])))
    assert got == want


def test_seed_candidates_ranks_true_homolog(rng):
    from pepr_tpu.ops.kmer_filter import seed_candidates
    base = rng.integers(0, 20, size=150).astype(np.int8)
    homolog = _mutate(base, rng, 0.15)
    decoys = [rng.integers(0, 20, size=150).astype(np.int8)
              for _ in range(8)]
    # genome 0 = query alone; genome 1 = homolog among decoys
    seqs = [base] + decoys[:4] + [homolog] + decoys[4:]
    offsets = np.array([0, 1, len(seqs)])
    cand = seed_candidates(seqs, seqs, offsets, top_per_genome=2)
    assert cand[0, 0, 0] == 0  # self tops its own genome
    assert cand[0, 1, 0] == 5  # homolog tops genome 1 by shared tiles


def test_seed_candidates_asymmetric_and_max_df(rng):
    from pepr_tpu.ops.kmer_filter import seed_candidates
    base = rng.integers(0, 20, size=100).astype(np.int8)
    member = _mutate(base, rng, 0.1)
    junk = [rng.integers(0, 20, size=100).astype(np.int8)
            for _ in range(3)]
    queries = [member] + junk
    targets = [base, junk[0].copy()]
    offsets = np.array([0, len(targets)])
    cand = seed_candidates(queries, targets, offsets, top_per_genome=1)
    assert cand[0, 0, 0] == 0  # member -> its consensus
    assert cand[1, 0, 0] == 1  # junk[0] -> its own copy
    # overused-tile masking: with max_df=0 every k-mer is dropped
    cand0 = seed_candidates(queries, targets, offsets, top_per_genome=1,
                            max_df=0)
    assert (cand0 == -1).all()


def test_seed_stage_carries_search_alone(rng):
    """The exact-seed stage alone (cosine prefilter disabled via an
    impossible min_sim) must still recover ortholog hits — this is the
    production recall path for strong homologs."""
    genomes, families = make_synthetic_genomes(rng)
    _, hits = search_all_vs_all(genomes, prefilter_min_sim=1.1)
    fam0 = set(families[0])
    for q in families[0]:
        partners = {int(t) for qq, t in zip(hits.query, hits.target)
                    if qq == q and t != q}
        assert partners & fam0, "seed-only ortholog hits missing"


def test_connected_components():
    comp = connected_components(6, np.array([0, 1, 3]), np.array([1, 2, 4]))
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert comp[5] not in (comp[0], comp[3])


def test_mcl_two_cliques():
    # two 4-cliques joined by a single weak edge
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 50.0))
    edges.append((0, 4, 1.0))
    ei = np.array([e[0] for e in edges])
    ej = np.array([e[1] for e in edges])
    w = np.array([e[2] for e in edges])
    clusters = mcl_cluster(8, ei, ej, w, inflation=1.5)
    sets = sorted(tuple(sorted(c)) for c in clusters)
    assert sets == [(0, 1, 2, 3), (4, 5, 6, 7)]


def test_mcl_singleton_and_pair():
    clusters = mcl_cluster(3, np.array([0]), np.array([1]), np.array([10.0]))
    sets = sorted(tuple(sorted(c)) for c in clusters)
    assert sets == [(0, 1), (2,)]


def test_search_all_vs_all_finds_orthologs(rng):
    genomes, families = make_synthetic_genomes(rng)
    universe, hits = search_all_vs_all(genomes, candidates_per_genome=2)
    # every family-0 member should hit every other genome's family-0 member
    fam0 = set(families[0])
    for q in families[0]:
        partners = {int(t) for qq, t in zip(hits.query, hits.target)
                    if qq == q and t != q}
        assert partners & fam0, "ortholog hits missing"
        # no junk proteins among hits for family members
        for t in partners:
            assert t in {m for f in families for m in f}


def test_cluster_homolog_groups_end_to_end(rng):
    genomes, families = make_synthetic_genomes(rng)
    universe, hits = search_all_vs_all(genomes, candidates_per_genome=2)
    clusters = cluster_homolog_groups(universe, hits)
    got = sorted(tuple(sorted(c)) for c in clusters)
    want = sorted(tuple(sorted(f)) for f in families)
    assert got == want
    ssets = groups_to_sequence_sets(universe, clusters)
    assert len(ssets) == len(clusters)
    assert sorted(len(s) for s in ssets) == [4] * len(families)
    # taxa preserved through titles
    assert set(ssets[0].taxa) == {f"Taxon_{g}" for g in range(4)}


def test_bidirectional_drops_self_and_one_way():
    hits = HitTable(
        query=np.array([0, 1, 2, 3]),
        target=np.array([1, 0, 2, 0]),  # 0<->1 mutual, 2 self, 3->0 one-way
        raw=np.ones(4, np.float32),
        bits=np.array([50.0, 40.0, 99.0, 30.0]),
        evalue=np.zeros(4),
        identity=np.full(4, 90.0),
        length=np.full(4, 100),
    )
    ei, ej, w = bidirectional_edges(hits)
    assert list(ei) == [0]
    assert list(ej) == [1]
    assert list(w) == [50.0]
