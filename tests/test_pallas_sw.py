"""Pallas Smith-Waterman kernel vs the XLA wavefront and the numpy
oracle (interpret mode on CPU; on TPU the same kernel compiles via
Mosaic)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pepr_tpu.ops.pallas_sw import sw_align_batch_pallas
from pepr_tpu.ops.smith_waterman import (kernel_matrix, sw_align_batch,
                                         sw_align_numpy)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(2)
    B, Lq, Lt = 16, 64, 96
    q = rng.integers(0, 20, size=(B, Lq)).astype(np.int8)
    t = rng.integers(0, 20, size=(B, Lt)).astype(np.int8)
    # plant homologous pairs so scores/trackers are non-trivial
    for b in range(0, B, 2):
        t[b, 10:10 + 40] = q[b, 5:45]
        mut = rng.random(40) < 0.2
        t[b, 10:10 + 40][mut] = rng.integers(0, 20, mut.sum())
    # PAD tails of variable length
    q[3, 50:] = 24
    t[3, 70:] = 24
    return q, t


def test_pallas_sw_matches_xla(batch):
    q, t = batch
    sub = jnp.asarray(kernel_matrix())
    want = sw_align_batch(jnp.asarray(q), jnp.asarray(t), sub)
    got = sw_align_batch_pallas(jnp.asarray(q), jnp.asarray(t), sub,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got["score"]),
                               np.asarray(want["score"]), rtol=1e-6)
    for k in ("matches", "length", "q_end", "t_end"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_pallas_sw_matches_numpy_oracle(batch):
    q, t = batch
    sub = kernel_matrix()
    got = sw_align_batch_pallas(jnp.asarray(q), jnp.asarray(t),
                                jnp.asarray(sub), interpret=True)
    for b in (0, 1, 3, 6):
        want = sw_align_numpy(q[b], t[b], sub)
        assert float(got["score"][b]) == pytest.approx(want["score"])
        assert int(got["matches"][b]) == want["matches"]
        assert int(got["length"][b]) == want["length"]


def test_pallas_sw_batch_padding():
    """B not a multiple of the tile size pads cleanly."""
    rng = np.random.default_rng(7)
    q = rng.integers(0, 20, size=(3, 32)).astype(np.int8)
    t = rng.integers(0, 20, size=(3, 32)).astype(np.int8)
    sub = jnp.asarray(kernel_matrix())
    got = sw_align_batch_pallas(jnp.asarray(q), jnp.asarray(t), sub,
                                interpret=True)
    want = sw_align_batch(jnp.asarray(q), jnp.asarray(t), sub)
    np.testing.assert_allclose(np.asarray(got["score"]),
                               np.asarray(want["score"]), rtol=1e-6)
