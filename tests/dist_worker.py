"""Two-process jax.distributed worker for test_distributed.py: runs the
REAL pipeline mesh code (initialize_distributed, default_mesh,
sharded_loglik, sharded_replicate_blopt) across processes with Gloo
CPU collectives.  Invoked as:

    python tests/dist_worker.py <process_id> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["PEPR_COORDINATOR"] = f"localhost:{port}"
    os.environ["PEPR_NUM_PROCS"] = "2"
    os.environ["PEPR_PROC_ID"] = str(pid)

    import numpy as np

    from pepr_tpu.models.treebuild import tree_to_arrays
    from pepr_tpu.ops.likelihood import WagModel, loglik
    from pepr_tpu.parallel.mesh import (default_mesh,
                                        initialize_distributed,
                                        sharded_loglik,
                                        sharded_replicate_blopt)
    from pepr_tpu.tree import parse_newick
    from pepr_tpu.utils.simulate import simulate_alignment

    assert initialize_distributed()
    assert jax.process_count() == 2
    mesh = default_mesh()
    # rep axis across processes, site axis within (ICI not DCN)
    assert mesh.shape["rep"] == 2 and mesh.shape["site"] == 2

    rng = np.random.default_rng(3)
    tree = parse_newick(
        "(((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1):0.1,(E:0.1,F:0.1):0.1);")
    codes, taxa = simulate_alignment(tree, 128, rng)
    arr = tree_to_arrays(tree, taxa)
    model = WagModel.create()
    w = np.ones(codes.shape[1], np.float32)

    total = float(sharded_loglik(mesh, codes, w, arr.children, arr.blen,
                                 model))
    want = float(loglik(codes, arr.children, arr.blen, model))
    assert abs(total - want) < 1e-2 * abs(want), (total, want)

    masks = (np.random.default_rng(5).random((4, codes.shape[1])) < 0.5
             ).astype(np.float32)
    blen, ll = sharded_replicate_blopt(
        mesh, codes, masks, np.stack([arr.children] * 4),
        np.stack([arr.blen] * 4), model, steps=5)
    assert blen.shape == (4, arr.blen.shape[0])
    assert np.isfinite(ll).all()
    print(f"DIST_OK {pid} {total:.3f} {ll[0]:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
