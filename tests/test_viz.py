"""Visualization tests (headless Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from nerf_sampling_tpu.viz import (
    normalize_directions,
    plot_histogram,
    plot_points,
    plot_rays,
    visualize_rays_pts,
)


def test_normalize_directions():
    """Reference visualize.py:97-110 numeric check."""
    rays_d = np.array([[1.5, 0, 3.14], [-1, 0.25, 0.33]])
    expected = np.array(
        [
            [0.43104810784, 0, 0.90232737241],
            [-0.92394970017, 0.23098742504, 0.30490340105],
        ]
    )
    got = normalize_directions(rays_d)
    assert got.shape == rays_d.shape
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)  # torch.allclose defaults


@pytest.fixture
def close_figs():
    yield
    import matplotlib.pyplot as plt

    plt.close("all")


def test_plots_build(close_figs, rng):
    ro = rng.standard_normal((3, 3))
    rd = rng.standard_normal((3, 3))
    pts = rng.standard_normal((3, 5, 3))
    w = rng.uniform(0, 1, (3, 5))
    fig, ax = plot_rays(ro, rd)
    assert len(ax.lines) == 6  # 2 segments per ray
    fig, ax = plot_points(pts, c=w)
    assert len(ax.collections) == 1
    fig, ax = visualize_rays_pts(ro, rd, pts, c=[[(0.0, 0.0, 1.0)]])
    assert len(ax.lines) == 6 and len(ax.collections) == 1
    fig, ax = plot_histogram(w)
    assert ax.get_xlabel() == "Density"


def test_figure_pickle_roundtrip(tmp_path, close_figs):
    from nerf_sampling_tpu.viz.visualize import save_figure_pickle
    import pickle

    fig, ax = plot_histogram(np.ones((2, 2)))
    p = str(tmp_path / "f.fig.pickle")
    save_figure_pickle(fig, p)
    with open(p, "rb") as f:
        fig2 = pickle.load(f)
    assert fig2.axes[0].get_xlabel() == "Density"
