"""Plot extracted scene point clouds.

Parity target: reference experiments/plot.py — load scene data, filter by
weight threshold, subsample 50k points, 3D scatter. Reads the .npz written
by render_path(save_scene_data=True) (the reference used torch scene_data.pt).
"""

from __future__ import annotations

import click
import numpy as np


@click.command()
@click.option("-f", "--file", "path", type=str, required=True,
              help="Path to scene_data.npz (from render.py -ssd).")
@click.option("-t", "--threshold", default=0.5, show_default=True,
              help="Minimum volume-rendering weight to keep a point.")
@click.option("-n", "--n_points", default=50_000, show_default=True)
@click.option("-o", "--out", default=None, help="Save figure instead of showing.")
def main(path: str, threshold: float, n_points: int, out: str | None):
    """Scatter-plot high-weight scene points."""
    data = np.load(path)
    pts = data["all_pts"]
    weights = data["all_weights"]
    mask = weights >= threshold
    pts = pts[mask]
    print(f"{mask.sum()} / {mask.size} points above weight {threshold}")
    if len(pts) > n_points:
        idx = np.random.default_rng(0).choice(len(pts), n_points, replace=False)
        pts = pts[idx]

    import matplotlib

    if out is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5)
    ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
    if out is not None:
        fig.savefig(out, dpi=150)
        print(f"saved {out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
