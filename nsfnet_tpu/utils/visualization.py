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


def psi_contours(solver, n: int = 201, out_path: str = "psi.png",
                 title: str = "Streamfunction"):
    """Iso-contours of the NET'S OWN psi output — for
    formulation='streamfunction' solvers these are the EXACT streamlines
    of the predicted flow (no numerical integration of (u, v) as in
    streamplot_cavity), including the weak corner eddies that streamline
    integration smears out."""
    if getattr(solver, "formulation", "velocity") != "streamfunction":
        raise ValueError("psi_contours requires a streamfunction solver "
                         "(the velocity formulation has no psi output)")
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    g = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(g, g)
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], axis=1),
                      jnp.float32)
    psi = np.asarray(solver.net.apply(solver.state.params, pts)[:, 0])
    P = psi.reshape(n, n) - psi.reshape(n, n).mean()

    fig, ax = plt.subplots(figsize=(8, 8))
    # log-spaced levels resolve the weak secondary/corner eddies (psi
    # spans ~4 orders of magnitude between the primary vortex and corners)
    amax = np.abs(P).max() or 1.0
    levels = np.concatenate([-amax * np.logspace(-4, 0, 12)[::-1],
                             amax * np.logspace(-4, 0, 12)])
    cs = ax.contour(X, Y, P, levels=np.sort(levels), linewidths=0.8,
                    cmap="RdBu_r")
    fig.colorbar(cs, ax=ax, label="psi (gauge-centered)")
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


def centerline_profiles(solver, eval_fields=None, out_path: str = "profiles.png",
                        title: str = "Centerline profiles"):
    """The classic lid-driven-cavity validation figure: u along the
    vertical centerline x=0.5 and v along the horizontal centerline
    y=0.5, overlaid on the DNS reference when `eval_fields`
    (x, y, u, v, p columns from CavityData.evaluate_data) is given.
    The reference repo validates against full-field L2 error only
    (ev-NSFnet/pinn_solver.py:669-693); this is the standard
    complementary figure from the cavity literature."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Work in the data's own coordinate frame: with
    # training.coordinate_transform the domain is [-1,1] and the
    # centerlines sit at 0, not 0.5 — infer the frame from the DNS grid
    # when given so prediction and overlay share the same physical lines.
    n = 257
    if eval_fields is not None:
        x_all = np.asarray(eval_fields[0]).ravel()
        y_all = np.asarray(eval_fields[1]).ravel()
        lo, hi = float(x_all.min()), float(x_all.max())
    else:
        lo, hi = 0.0, 1.0
    mid = 0.5 * (lo + hi)
    g = np.linspace(lo, hi, n)
    half = np.full(n, mid)
    u_c, _, _, _ = solver.neural_net_u(half, g)      # u(mid, y)
    _, v_c, _, _ = solver.neural_net_u(g, half)      # v(x, mid)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.5))
    ax1.plot(np.asarray(u_c), g, "-", lw=2, label="prediction")
    ax2.plot(g, np.asarray(v_c), "-", lw=2, label="prediction")

    if eval_fields is not None:
        x, y, u, v, _ = (np.asarray(a).ravel() for a in eval_fields)
        # nearest-grid-line selection (robust to even-sized grids where
        # the exact centerline falls between two columns)
        ux, uy = np.unique(x), np.unique(y)
        on_v = x == ux[np.argmin(np.abs(ux - mid))]
        on_h = y == uy[np.argmin(np.abs(uy - mid))]
        if on_v.any():
            o = np.argsort(y[on_v])
            ax1.plot(u[on_v][o], y[on_v][o], "k.", ms=3, label="DNS")
        if on_h.any():
            o = np.argsort(x[on_h])
            ax2.plot(x[on_h][o], v[on_h][o], "k.", ms=3, label="DNS")

    ax1.set_xlabel(f"u({mid:g}, y)")
    ax1.set_ylabel("y")
    ax2.set_xlabel("x")
    ax2.set_ylabel(f"v(x, {mid:g})")
    for ax in (ax1, ax2):
        ax.grid(alpha=0.3)
        ax.legend()
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
