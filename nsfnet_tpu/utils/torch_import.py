"""Import the reference's torch ``.pth`` checkpoints into MLP ``Params``.

The reference saves each network as a bare ``state_dict`` of its ``FCNet``
(ev-NSFnet/pinn_solver.py:755-759: ``torch.save(net.state_dict(), f)`` for
the main net and ``f + '_evm'`` for the EVM net), with keys
``layers.layer_<i>.weight`` ([fan_out, fan_in], torch convention) and
``layers.layer_<i>.bias`` (ev-NSFnet/net.py:36-50). This module converts
those into this framework's flat ``((W, b), ...)`` tuples with
W: [fan_in, fan_out], so published reference checkpoints can be replayed
through ``evaluate``/``test`` for direct numerical cross-validation.

torch is only imported inside the functions — the training path never
depends on it.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

_KEY = re.compile(r"^(?:module\.)?layers\.layer_(\d+)\.(weight|bias)$")


def state_dict_to_params(state_dict: Dict[str, "object"]):
    """Convert an FCNet state_dict (possibly DDP ``module.``-prefixed) to
    ``((W, b), ...)`` with W transposed to [fan_in, fan_out] float32."""
    layers: Dict[int, Dict[str, np.ndarray]] = {}
    for key, value in state_dict.items():
        m = _KEY.match(key)
        if m is None:
            raise ValueError(
                f"unrecognized state_dict key {key!r} — expected "
                "'layers.layer_<i>.weight|bias' (reference FCNet format)")
        idx, kind = int(m.group(1)), m.group(2)
        arr = np.asarray(getattr(value, "numpy", lambda: value)(),
                         dtype=np.float32)
        layers.setdefault(idx, {})[kind] = arr
    params = []
    for idx in range(len(layers)):
        if idx not in layers or set(layers[idx]) != {"weight", "bias"}:
            raise ValueError(f"state_dict missing layer_{idx} weight/bias")
        w = layers[idx]["weight"].T  # torch [out, in] -> [in, out]
        b = layers[idx]["bias"]
        if w.shape[1] != b.shape[0]:
            raise ValueError(
                f"layer_{idx}: weight {w.shape} inconsistent with bias {b.shape}")
        params.append((w, b))
    return tuple(params)


def load_torch_params(path: str):
    """Load a reference ``.pth`` state_dict file into ``Params``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_params(sd)


def params_shapes(params) -> Tuple[Tuple[int, ...], ...]:
    return tuple(tuple(w.shape) for w, _ in params)


def params_to_state_dict(params):
    """Inverse of ``state_dict_to_params``: MLP ``Params`` -> an FCNet
    state_dict (torch tensors, [fan_out, fan_in] weights, reference key
    names) so checkpoints trained HERE replay in the reference's own
    tooling (ev-NSFnet/test.py:27-99 loads exactly this format)."""
    import torch

    sd = {}
    for idx, (w, b) in enumerate(params):
        sd[f"layers.layer_{idx}.weight"] = torch.from_numpy(
            np.asarray(w, dtype=np.float32).T.copy())
        sd[f"layers.layer_{idx}.bias"] = torch.from_numpy(
            np.asarray(b, dtype=np.float32).copy())
    return sd


def save_torch_params(params, path: str, params_evm=None):
    """Write reference-format ``.pth`` file(s): the main net at ``path``
    and, as the reference's sibling convention, the EVM net at
    ``<path>_evm`` (ev-NSFnet/pinn_solver.py:755-759)."""
    import torch

    torch.save(params_to_state_dict(params), path)
    if params_evm is not None:
        torch.save(params_to_state_dict(params_evm), path + "_evm")
    return path
