"""Sphere-intersection geometry suite.

Keeps the reference's geometry test semantics verbatim
(/root/reference/nerf_sampling/tests/tests.py:197-331) plus a torch
cross-check of the quadratic solver.
"""

import jax.numpy as jnp
import numpy as np
import torch

from nerf_sampling_tpu.core import (
    find_intersection_points_with_sphere,
    solve_quadratic_equation,
)


def nan_equal(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.allclose(a[~np.isnan(a)], b[~np.isnan(b)]) and (
        np.isnan(a) == np.isnan(b)
    ).all()


def test_solve_quadratic_equation():
    got = solve_quadratic_equation(
        jnp.array([1.0]), jnp.array([2.0]), jnp.array([1.0])
    )
    assert nan_equal(got, np.array([[-1.0], [-1.0]]))

    got = solve_quadratic_equation(
        jnp.array([[1.0, 4, 5], [1, 4, 5]]),
        jnp.array([[1.0, 4, 6], [1, 4, 6]]),
        jnp.array([[1.0, 1, 1], [1, 1, 1]]),
    )
    want = np.array(
        [
            [[np.nan, -0.5, -1], [np.nan, -0.5, -1]],
            [[np.nan, -0.5, -0.2], [np.nan, -0.5, -0.2]],
        ]
    )
    assert nan_equal(got, want)

    got = solve_quadratic_equation(
        jnp.array([1.0, 4, 5, 1, 4, 5]),
        jnp.array([1.0, 4, 6, 1, 4, 6]),
        jnp.array([1.0, 1, 1, 1, 1, 1]),
    )
    want = np.array(
        [
            [np.nan, -0.5, -1, np.nan, -0.5, -1],
            [np.nan, -0.5, -0.2, np.nan, -0.5, -0.2],
        ]
    )
    assert nan_equal(got, want)


def test_quadratic_matches_torch_reference_formula(rng):
    a = rng.uniform(0.5, 2, 50).astype(np.float32)
    b = rng.standard_normal(50).astype(np.float32) * 4
    c = rng.standard_normal(50).astype(np.float32)
    # Drop ill-conditioned cases (delta ~ 0): 1-ulp sqrt differences between
    # backends get amplified arbitrarily there and say nothing about parity.
    delta_np = b**2 - 4 * a * c
    keep = np.abs(delta_np) > 1e-2
    a, b, c = a[keep], b[keep], c[keep]
    got = solve_quadratic_equation(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    # reference utils.py:159-179 in torch
    ta, tb, tc = map(torch.from_numpy, (a, b, c))
    delta = tb**2 - 4 * ta * tc
    pm = torch.stack([torch.ones_like(delta), -torch.ones_like(delta)])
    want = (-tb - (pm * torch.sqrt(delta))) / (2 * ta)
    got_np, want_np = np.asarray(got), want.numpy()
    assert (np.isnan(got_np) == np.isnan(want_np)).all()
    m = ~np.isnan(want_np)
    np.testing.assert_allclose(got_np[m], want_np[m], rtol=1e-4, atol=1e-4)


def test_find_intersection_points_with_sphere_output_shape():
    rays = jnp.zeros((4, 3))
    t, pts = find_intersection_points_with_sphere(rays, rays, jnp.array([2.0]))
    assert pts.shape == (4, 2, 3)
    assert t.shape == (4, 2)


def test_intersection_ray_directed_towards_sphere():
    ro = jnp.array([[-3.0, 0.0, 0.0]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert nan_equal(pts[0], np.array([[-1.0, 0, 0], [1.0, 0, 0]]))


def test_no_intersection_ray_parallel_to_sphere():
    ro = jnp.array([[-3.0, 0.0, 0.0]])
    rd = jnp.array([[0.0, 2.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert np.isnan(np.asarray(pts)).all()


def test_intersection_ray_directed_away_from_sphere():
    ro = jnp.array([[-3.0, 0.0, 0.0]])
    rd = jnp.array([[-1.0, 0.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert nan_equal(pts[0], np.array([[1.0, 0, 0], [-1.0, 0, 0]]))


def test_tangential_ray_intersects_at_one_point():
    ro = jnp.array([[-3.0, 1.0, 0.0]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert nan_equal(pts[0], np.array([[0.0, 1, 0], [0.0, 1, 0]]))


def test_origin_on_sphere():
    ro = jnp.array([[1.0, 0.0, 0.0]])
    rd = jnp.array([[0.0, 1.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert nan_equal(pts[0], np.array([[1.0, 0, 0], [1.0, 0, 0]]))


def test_origin_inside_sphere():
    ro = jnp.array([[0.0, 0.0, 0.0]])
    rd = jnp.array([[-1.0, 0.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert nan_equal(pts[0], np.array([[1.0, 0, 0], [-1.0, 0, 0]]))


def test_origin_on_sphere_moving_inward():
    ro = jnp.array([[1.0, 0.0, 0.0]])
    rd = jnp.array([[-1.0, 0.0, 0.0]])
    _, pts = find_intersection_points_with_sphere(ro, rd, jnp.array([1.0]))
    assert nan_equal(pts[0], np.array([[1.0, 0, 0], [-1.0, 0, 0]]))
