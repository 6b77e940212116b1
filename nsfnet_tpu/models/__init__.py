from nsfnet_tpu.models.mlp import MLP, init_mlp, mlp_apply
from nsfnet_tpu.models.kan import KAN, init_kan, kan_apply

__all__ = ["MLP", "init_mlp", "mlp_apply", "KAN", "init_kan", "kan_apply"]
