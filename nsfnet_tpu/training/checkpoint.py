"""Full-train-state checkpointing with exact resume.

The reference checkpoints only the two network state_dicts — optimizer
moments, step counter and the vis_t field are lost on resume
(ev-NSFnet/pinn_solver.py:742-759, 108-120). Here the whole TrainState
pytree (params, both optimizer states, vis_t carry, counters) is serialized
(flax msgpack) together with a JSON metadata sidecar, so resume is
bit-exact.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
from flax import serialization


def save_state(path: str, state: Any, metadata: Optional[dict] = None) -> None:
    """Atomic write (tmp + rename): an unattended-run watchdog may kill the
    process mid-checkpoint and resume from the newest file — a torn write
    must never be the newest file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
        f.flush()
        os.fsync(f.fileno())
    if metadata is not None:
        with open(path + ".json.tmp", "w") as f:
            json.dump(metadata, f, indent=2)
        os.replace(path + ".json.tmp", path + ".json")
    os.replace(tmp, path)  # ckpt becomes visible only after its metadata


def restore_state(path: str, template: Any) -> Any:
    """Restore into `template` (a TrainState with correctly-shaped leaves)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_metadata(path: str) -> Optional[dict]:
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


def peek_architecture(path: str) -> Optional[dict]:
    """Read the main/EVM network shapes straight from the serialized
    state, no template needed (flax.from_bytes silently restores
    mismatched shapes into a template, so shape errors must be caught
    BEFORE building a donor template — train.py --init-from)."""
    from flax import serialization

    try:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        params = raw["params"]
        n = len(params)
        arch = {
            "layers": n - 1,
            "hidden_size": int(params["0"]["0"].shape[1]),
            "num_ins": int(params["0"]["0"].shape[0]),
        }
        if raw.get("params_evm"):
            evm = raw["params_evm"]
            arch["layers_1"] = len(evm) - 1
            arch["hidden_size_1"] = int(evm["0"]["0"].shape[1])
        return arch
    except Exception:
        return None
