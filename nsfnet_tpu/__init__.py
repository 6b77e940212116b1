"""nsfnet_tpu — a TPU-native physics-informed neural network (PINN) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
latteine1217/NSFnet (PyTorch): steady 2-D incompressible lid-driven cavity
flow solved by PINNs, in two flavors — the vanilla NSFnet solver and the
entropy-viscosity-regularized ev-NSFnet solver — plus a physics-informed
KAN backbone.

Design principles (TPU-first, not a port):
  * Forward-mode (jvp-of-jvp / Taylor) derivatives instead of chained
    reverse-mode autograd: 2 tangent sweeps give every first and diagonal
    second derivative needed by the Navier-Stokes residual.
  * Everything in the hot loop lives inside one jitted, scan-chunked train
    step; the entropy-viscosity lag field is a device-side carry (the
    reference does a host round-trip per step: ev-NSFnet/pinn_solver.py:334).
  * Data parallelism over a `jax.sharding.Mesh` with XLA collectives over
    ICI — works identically on 1 chip, a pod slice, or a CPU fake mesh.
  * A fused Pallas kernel for the MLP value+tangent propagation (weights
    VMEM-resident) as the speed-of-light path.
"""

__version__ = "0.1.0"

from nsfnet_tpu.config import (
    AppConfig,
    ConfigManager,
    NetworkConfig,
    PhysicsConfig,
    SDFWeightConfig,
    SupervisionConfig,
    TrainingConfig,
    TrainingStage,
)

__all__ = [
    "AppConfig",
    "ConfigManager",
    "NetworkConfig",
    "PhysicsConfig",
    "SDFWeightConfig",
    "SupervisionConfig",
    "TrainingConfig",
    "TrainingStage",
    "__version__",
]
