"""Native AU test (models/au_test.py) — the CONSEL drive replacement
(TreeComparison.java:812-885 role)."""

import numpy as np

from pepr_tpu.models.au_test import au_report, au_test


def _sitelh(rng, L, true_adv, n_alt=2):
    """Per-site LLs for one 'true' tree and alternatives that are
    worse by `true_adv` per site on average."""
    base = rng.normal(-3.0, 1.0, size=L)
    rows = [base]
    for _ in range(n_alt):
        rows.append(base - np.abs(rng.normal(true_adv, 0.5 * true_adv,
                                             size=L)))
    return np.stack(rows)


def test_au_clear_winner():
    rng = np.random.default_rng(0)
    sl = _sitelh(rng, L=500, true_adv=0.2)
    res = au_test(sl, n_reps=500, seed=1)
    assert res.au[0] > 0.95  # decisively best tree not rejected
    assert res.au[1] < 0.05 and res.au[2] < 0.05  # alternatives rejected
    assert res.np_bp[0] > 0.95
    assert res.obs_diff[0] == 0.0


def test_au_indistinguishable_trees():
    """Two trees with per-site noise but no systematic difference:
    neither should be strongly rejected."""
    rng = np.random.default_rng(2)
    L = 800
    base = rng.normal(-3.0, 1.0, size=L)
    a = base + rng.normal(0.0, 0.05, size=L)
    b = base + rng.normal(0.0, 0.05, size=L)
    res = au_test(np.stack([a, b]), n_reps=500, seed=3)
    assert res.au.min() > 0.05  # no confident rejection either way


def test_au_report_format():
    rng = np.random.default_rng(4)
    sl = _sitelh(rng, L=300, true_adv=0.3, n_alt=1)
    res = au_test(sl, n_reps=300, seed=5)
    txt = au_report(res, names=["ml", "alt"])
    lines = txt.splitlines()
    assert lines[0].startswith("#")
    assert "ml" in lines[1]  # best tree ranked first
