from nsfnet_tpu.ops.derivatives import derivatives_2d, mlp_derivatives_2d
from nsfnet_tpu.ops.residuals import ns_residuals, ev_ns_residuals

__all__ = ["derivatives_2d", "mlp_derivatives_2d", "ns_residuals", "ev_ns_residuals"]
