"""Value-only fused MLP kernel (EVM net path) vs plain apply + autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.models.mlp import init_mlp, mlp_apply
from nsfnet_tpu.ops.pallas_mlp_fwd import TILE, make_fused_mlp_forward


def test_forward_and_grads_match():
    params = init_mlp(jax.random.PRNGKey(0), (2, 40, 40, 40, 40, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2 * TILE, 2), jnp.float32)
    fused = make_fused_mlp_forward("highest")

    np.testing.assert_allclose(np.asarray(fused(params, x)),
                               np.asarray(mlp_apply(params, x)),
                               rtol=2e-5, atol=1e-6)

    def loss(engine):
        return lambda p: jnp.mean(jnp.abs(engine(p, x)))

    g_ref = jax.grad(loss(mlp_apply))(params)
    g_got = jax.grad(loss(fused))(params)
    for (wr, br), (wg, bg) in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr), rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bg), np.asarray(br), rtol=5e-4, atol=1e-6)
