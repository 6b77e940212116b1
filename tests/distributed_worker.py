"""Subprocess worker for the 2-process distributed integration test.

Launched by tests/test_distributed.py with a faked Open-MPI rendezvous
environment (OMPI_COMM_WORLD_SIZE/RANK + JAX_COORDINATOR_ADDRESS), one CPU
device per process — the same bring-up path `scripts/launch.sh` exercises
on a real pod slice (parity: ev-NSFnet/train.py:22-43, which ran 2-process
NCCL on 2 GPUs). Trains a tiny flagship for a fixed number of steps over
the 2-device global mesh and dumps the final (replicated) params.

Usage: python tests/distributed_worker.py <out.npz> [n_epochs] [engine]

engine="pallas" runs the combination a real pod uses — the shard_map
runner with explicit psums around the fused Pallas kernel (interpret mode
on CPU) — including the cross-process vis_t checkpoint gather at the
kernel's TILE padding (VERDICT r3 weak #5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize pins the TPU platform at interpreter start; tests run CPU
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from nsfnet_tpu.parallel.mesh import initialize_distributed  # noqa: E402


def main():
    out, n_epochs = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10
    engine = sys.argv[3] if len(sys.argv) > 3 else "auto"
    assert initialize_distributed(), "env markers should trigger bring-up"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()  # one CPU device per proc

    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.training.solver import PINNSolver

    solver = PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                        hidden_size_1=8, N_f=256, alpha_evm=0.03,
                        bc_weight=10, eq_weight=1, seed=7, engine=engine,
                        log_interval=10**9, checkpoint_freq=10**9,
                        checkpoint_path=os.path.join(os.path.dirname(os.path.abspath(out)), "shared_ckpts"))
    assert solver.engine == engine or engine == "auto", solver.engine
    assert solver.world_size == 2
    data = CavityData(N_f=256, sort_training_points=False, seed=0)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.train(num_epoch=n_epochs, lr=1e-3)

    params = jax.device_get(solver.state.params)
    arrs = {}
    for i, (w, b) in enumerate(params):
        arrs[f"w{i}"], arrs[f"b{i}"] = np.asarray(w), np.asarray(b)
    np.savez(out, **arrs)
    # checkpoint write exercises the cross-process vis_t gather (rank 0
    # writes; the gather is collective on all ranks)
    path = solver.save("dist.ckpt", directory=os.path.join(
        os.path.dirname(os.path.abspath(out)), "shared_ckpts"))
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")  # rank 1 must not
    # read before rank 0's write completes

    # multi-process restore: every rank loads the same file (shared fs) and
    # re-shards; training must continue (crash-recovery path on a pod)
    before = jax.device_get(solver.state.params)
    solver.load(path)
    after = jax.device_get(solver.state.params)
    for (w0, b0), (w1, b1) in zip(before, after):
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    solver.train(num_epoch=2, lr=1e-3)

    print(f"DONE rank={jax.process_index()}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
