"""Cross-validation of the WAG+Gamma likelihood kernel against the
reference's bundled raxmlHPC binary (used as a black-box oracle, the
same way the reference pipeline invokes it: RAxMLRunner.java:79-280).
Skipped when the binary is unavailable/not executable."""

import os
import re
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

from pepr_tpu.alphabet import AA_ORDER, encode
from pepr_tpu.data.wag import WAG_RATES
from pepr_tpu.ops.gamma import discrete_gamma_rates
from pepr_tpu.ops.likelihood import WagModel, loglik, tree_to_arrays
from pepr_tpu.tree import parse_newick

RAXML = "/root/reference/pepr-bin_linux/raxmlHPC"

# RAxML 7.2.5 hardcodes WAG frequencies rounded to 3 decimals; use the
# same values for the comparison so only the engine is under test.
RAXML_WAG_FREQS = np.array([
    0.087, 0.044, 0.039, 0.057, 0.019, 0.037, 0.058, 0.083, 0.024, 0.049,
    0.086, 0.062, 0.020, 0.038, 0.046, 0.070, 0.061, 0.014, 0.035, 0.071])
RAXML_WAG_FREQS /= RAXML_WAG_FREQS.sum()


def _raxml_model(alpha: float) -> WagModel:
    pi = RAXML_WAG_FREQS
    q = WAG_RATES * pi[None, :]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(1))
    mu = -(pi * np.diag(q)).sum()
    q /= mu
    d = np.sqrt(pi)
    b = d[:, None] * q / d[None, :]
    b = (b + b.T) / 2
    eig, v = np.linalg.eigh(b)
    return WagModel(eig.astype(np.float32), (v / d[:, None]).astype(np.float32),
                    (v.T * d[None, :]).astype(np.float32),
                    pi.astype(np.float32),
                    discrete_gamma_rates(alpha).astype(np.float32))


@pytest.mark.skipif(not os.access(RAXML, os.X_OK), reason="no raxml binary")
def test_loglik_close_to_raxml(tmp_path, rng):
    n, L = 6, 200
    base = rng.integers(0, 20, size=L)

    def mutate(s, rate):
        s = s.copy()
        m = rng.random(L) < rate
        s[m] = rng.integers(0, 20, size=m.sum())
        return s

    a = mutate(base, 0.1)
    seqs = {"A": a, "B": mutate(a, 0.1), "C": mutate(base, 0.15),
            "D": mutate(base, 0.2), "E": mutate(base, 0.3),
            "F": mutate(base, 0.35)}
    phy = tmp_path / "align.phy"
    with open(phy, "w") as fh:
        fh.write(f" {n} {L}\n")
        for k, v in seqs.items():
            fh.write(k.ljust(10) + "".join(AA_ORDER[x] for x in v) + "\n")
    start = tmp_path / "start.nwk"
    start.write_text(
        "((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1,(E:0.1,F:0.1):0.1);\n")
    try:
        subprocess.run(
            [RAXML, "-f", "e", "-m", "PROTGAMMAWAG", "-s", str(phy),
             "-t", str(start), "-n", "ev"],
            cwd=tmp_path, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError) as e:
        pytest.skip(f"raxml not runnable: {e}")
    info = (tmp_path / "RAxML_info.ev").read_text()
    raxml_ll = float(re.search(r"Final GAMMA  likelihood: (\S+)", info).group(1))
    alpha = float(re.search(r"alpha: (\S+)", info).group(1))
    tree = parse_newick((tmp_path / "RAxML_result.ev").read_text())
    arr = tree_to_arrays(tree, list(seqs))
    codes = np.stack([encode("".join(AA_ORDER[x] for x in seqs[k]))
                      for k in seqs])
    model = _raxml_model(alpha)
    ours = float(loglik(jnp.asarray(codes), jnp.asarray(arr.children),
                        jnp.asarray(arr.blen), model))
    # model-variant differences (gamma discretization details) leave a
    # small gap; the engine must be within 0.5% of the oracle
    assert ours == pytest.approx(raxml_ll, rel=5e-3)
