"""Host-side plotting helpers (matplotlib; replaces the reference's
pyvista warped-surface plots, ``hmm.py:493-511`` / ``helpers.py:305-315``)."""

from __future__ import annotations

import numpy as np

__all__ = ["plot_fem_function", "func_to_png"]


def plot_fem_function(V, u, filename=None, title=None, cmap="viridis", show=False):
    """Filled-contour plot of a scalar P1 function (2D meshes).

    Vector functions are plotted by magnitude.  Returns the figure.
    """
    import matplotlib

    if not show:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    import matplotlib.tri as tri

    mesh = V.mesh
    if mesh.dim != 2:
        raise NotImplementedError("plotting is implemented for 2D meshes")
    vals = np.asarray(u.array).reshape(-1, V.bs)
    scalar = vals[:, 0] if V.bs == 1 else np.linalg.norm(vals, axis=1)
    triang = tri.Triangulation(mesh.vertices[:, 0], mesh.vertices[:, 1], mesh.cells)
    fig, ax = plt.subplots(figsize=(8, 8))
    mappable = ax.tricontourf(triang, scalar, levels=100, cmap=cmap)
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    fig.colorbar(mappable, ax=ax)
    if filename:
        fig.savefig(filename, dpi=200, bbox_inches="tight")
    if show:
        plt.show()
    return fig


def func_to_png(filename, V, v, save=True, cmap="viridis", title=None, **_):
    """Reference-examples compat wrapper (``examples/diffusion/laminate.py:15``)."""
    return plot_fem_function(
        V, v, filename=f"{filename}.png" if save else None, title=title, cmap=cmap
    )
