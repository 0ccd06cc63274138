import numpy as np
import pytest

from pepr_tpu.alphabet import encode
from pepr_tpu.io.fasta import pack_padded
from pepr_tpu.ops.smith_waterman import (kernel_matrix, sw_align_batch,
                                         sw_align_numpy)

SUB = kernel_matrix()


def _batch(pairs, lq=None, lt=None):
    qs = [encode(a) for a, _ in pairs]
    ts = [encode(b) for _, b in pairs]
    q, _ = pack_padded(qs, multiple=lq or 16)
    t, _ = pack_padded(ts, multiple=lt or 16)
    return q, t


def test_identical_sequences():
    s = "MKVLITGAGSGIGL"
    q, t = _batch([(s, s)])
    out = sw_align_batch(q, t, SUB)
    expect = sum(SUB[c, c] for c in encode(s))
    assert float(out["score"][0]) == expect
    assert int(out["matches"][0]) == len(s)
    assert int(out["length"][0]) == len(s)
    assert int(out["q_end"][0]) == len(s) - 1
    assert int(out["t_end"][0]) == len(s) - 1


def test_no_similarity():
    q, t = _batch([("WWWWWW", "GGGGGG")])
    out = sw_align_batch(q, t, SUB)
    assert float(out["score"][0]) == 0.0


def test_gapped_alignment():
    a = "MKVLITGAGSGIGLAAAKRF"
    b = "MKVLITGAGSGLAAAKRF"  # 2-residue deletion
    q, t = _batch([(a, b)])
    out = sw_align_batch(q, t, SUB)
    ref = sw_align_numpy(encode(a), encode(b), SUB)
    assert float(out["score"][0]) == ref["score"]
    assert int(out["matches"][0]) == ref["matches"]
    assert int(out["length"][0]) == ref["length"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_vs_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(8):
        la, lb = rng.integers(14, 60, size=2)
        a = rng.integers(0, 20, size=la).astype(np.int8)
        b = rng.integers(0, 20, size=lb).astype(np.int8)
        # plant a shared motif in some pairs
        if rng.random() < 0.5:
            motif = rng.integers(0, 20, size=12).astype(np.int8)
            a[:12] = motif
            b[-12:] = motif
        pairs.append((a, b))
    q, _ = pack_padded([a for a, _ in pairs], multiple=16)
    t, _ = pack_padded([b for _, b in pairs], multiple=16)
    out = sw_align_batch(q, t, SUB)
    for i, (a, b) in enumerate(pairs):
        ref = sw_align_numpy(a, b, SUB)
        assert float(out["score"][i]) == ref["score"], i
        assert int(out["matches"][i]) == ref["matches"], i
        assert int(out["length"][i]) == ref["length"], i
        assert int(out["q_end"][i]) == ref["q_end"], i
        assert int(out["t_end"][i]) == ref["t_end"], i


def test_batch_padding_independence():
    a, b = "MKVLITGAGSGIGL", "MKVLITGAGSGIGL"
    q1, t1 = _batch([(a, b)], lq=16, lt=16)
    q2, t2 = _batch([(a, b)], lq=128, lt=256)
    s1 = sw_align_batch(q1, t1, SUB)["score"][0]
    s2 = sw_align_batch(q2, t2, SUB)["score"][0]
    assert float(s1) == float(s2)


def test_real_proteins(example_dir):
    import os
    from pepr_tpu.io.fasta import read_fasta
    ss = read_fasta(os.path.join(
        example_dir, "Erysipelothrix_rhusiopathiae_ATCC_19414.PATRIC.faa"))
    seqs = ss.seqs[:4]
    q, _ = pack_padded(seqs, multiple=128)
    out = sw_align_batch(q, q, SUB)  # self-alignments
    for i, s in enumerate(seqs):
        expect = float(sum(SUB[c, c] for c in s))
        assert float(out["score"][i]) == expect
        assert int(out["matches"][i]) == len(s)
