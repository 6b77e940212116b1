"""Multi-host bring-up decision logic (replaces torchrun rendezvous,
ev-NSFnet/train.py:22-43): pure env-based detection, loud failure — no
silent single-process degrade on a misconfigured pod."""

import pytest

import nsfnet_tpu.parallel.mesh as M


def test_distributed_decision_logic():
    assert not M.should_initialize_distributed({})
    assert M.should_initialize_distributed({"COORDINATOR_ADDRESS": "h:8476"})
    assert M.should_initialize_distributed({"JAX_COORDINATOR_ADDRESS": "h:1"})
    assert M.should_initialize_distributed({"SLURM_NTASKS": "4"})
    assert not M.should_initialize_distributed({"SLURM_NTASKS": "1"})
    assert M.should_initialize_distributed({"OMPI_COMM_WORLD_SIZE": "2"})
    assert M.should_initialize_distributed({"NSFNET_NUM_PROCESSES": "8"})
    # TPU pod slice: multi-host worker list published by libtpu
    assert M.should_initialize_distributed(
        {"TPU_WORKER_HOSTNAMES": "t1w-0,t1w-1"})
    assert not M.should_initialize_distributed({"TPU_WORKER_HOSTNAMES": "t1w-0"})
    # malformed world sizes are ignored, not crashed on
    assert not M.should_initialize_distributed({"SLURM_NTASKS": "garbage"})


def test_initialize_distributed_raises_loudly(monkeypatch):
    import jax

    def boom(*a, **k):
        raise RuntimeError("no coordinator reachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    # multi-process env detected + bring-up failure => raise (no silent
    # fallback that would train on 1/N of the pod)
    with pytest.raises(RuntimeError, match="no coordinator"):
        M.initialize_distributed({"COORDINATOR_ADDRESS": "host:1234"})
    # single-process env: no-op, never calls initialize
    assert M.initialize_distributed({}) is False
