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
