"""Flow-field visualization (parity with the KAN notebook's streamplot cell,
physics_informed_kan.ipynb cell 1, and the cavity.png artifact)."""

from __future__ import annotations

import numpy as np


def streamplot_cavity(solver, n: int = 100, out_path: str = "cavity.png",
                      title: str = "Velocity field"):
    """Predict (u, v) on an n x n grid and save a streamline plot."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(g, g)
    u, v, _, _ = solver.neural_net_u(X.ravel(), Y.ravel())
    U = np.asarray(u).reshape(n, n)
    V = np.asarray(v).reshape(n, n)

    fig, ax = plt.subplots(figsize=(8, 8))
    speed = np.sqrt(U**2 + V**2)
    strm = ax.streamplot(X, Y, U, V, density=[0.5, 1], color=speed,
                         cmap="viridis")
    fig.colorbar(strm.lines, ax=ax, label="|u|")
    ax.set_title(title)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def kan_plot(kan, params, out_path: str = "kan_splines.png", n_pts: int = 101):
    """Visualize each learned KAN edge function phi_ij (parity with pykan's
    model.plot, physics_informed_kan.ipynb cell 3).

    One row per layer; each panel overlays the edge functions feeding one
    output unit, alpha-weighted by their relative magnitude (pykan's beta
    shading analogue).
    """
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from nsfnet_tpu.models.kan import bspline_basis

    lo, hi = kan.grid_range
    x = jnp.linspace(lo, hi, n_pts)
    basis = bspline_basis(x, kan.grid, kan.k, kan.grid_range)  # [n, B]

    n_layers = len(params)
    max_out = max(p[0].shape[1] for p in params)
    fig, axes = plt.subplots(n_layers, max_out,
                             figsize=(2.2 * max_out, 2.2 * n_layers),
                             squeeze=False)
    silu = np.asarray(x) / (1 + np.exp(-np.asarray(x)))
    for li, (coef, w_base, w_sp) in enumerate(params):
        fan_in, fan_out, _ = coef.shape
        spline = np.einsum("nb,iob->nio", np.asarray(basis), np.asarray(coef))
        phi = (np.asarray(w_base)[None] * silu[:, None, None]
               + np.asarray(w_sp)[None] * spline)          # [n, in, out]
        mag = np.abs(phi).mean(axis=0)                     # [in, out]
        for j in range(max_out):
            ax = axes[li][j]
            if j >= fan_out:
                ax.axis("off")
                continue
            scale = mag[:, j].max() or 1.0
            for i in range(fan_in):
                ax.plot(np.asarray(x), phi[:, i, j],
                        alpha=float(np.clip(mag[i, j] / scale, 0.15, 1.0)))
            ax.set_title(f"L{li} -> out {j}", fontsize=7)
            ax.tick_params(labelsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def field_heatmaps(solver, n: int = 257, out_path: str = "fields.png"):
    """u / v / p / e heatmaps on an n x n grid (the .mat fields, visualized)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(g, g)
    u, v, p, e = solver.neural_net_u(X.ravel(), Y.ravel())
    fig, axes = plt.subplots(2, 2, figsize=(11, 10))
    for ax, (name, q) in zip(axes.flat,
                             [("u", u), ("v", v), ("p", p), ("e (EVM)", e)]):
        im = ax.imshow(np.asarray(q).reshape(n, n), origin="lower",
                       extent=(0, 1, 0, 1), cmap="RdBu_r")
        fig.colorbar(im, ax=ax)
        ax.set_title(name)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
