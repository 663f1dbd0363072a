"""Ray-sphere intersection geometry (DepthNet input features).

Parity targets: reference nerf_pytorch/utils.py:159-217
(solve_quadratic_equation / find_intersection_points_with_sphere), including
NaN propagation for rays that miss the sphere (delta < 0 -> sqrt of negative
-> NaN, which XLA propagates identically to torch).
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_quadratic_equation(
    a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> jnp.ndarray:
    """Solve ax^2 + bx + c = 0 elementwise; NaN where no real root exists.

    For input shape (x1, ..., xn) the result has shape (2, x1, ..., xn) with
    solutions [(-b - sqrt(d))/2a, (-b + sqrt(d))/2a] at index 0 and 1 —
    matching reference utils.py:159-179 (pm = [+1, -1], sols = (-b - pm*sqrt)/2a).
    """
    delta = b**2 - 4 * a * c
    pm = jnp.stack([jnp.ones_like(delta), -jnp.ones_like(delta)])
    sqrt_delta = jnp.sqrt(delta)  # NaN when delta < 0, as in the reference.
    return (-b - (pm * sqrt_delta)) / (2 * a)


def find_intersection_points_with_sphere(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    sphere_radius: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intersect rays with an origin-centered sphere.

    Args:
        origin: [n, 3] ray origins.
        direction: [n, 3] ray directions (not necessarily unit).
        sphere_radius: scalar or [1] radius. Sphere center is hardcoded to the
            world origin, as in the reference (utils.py:200).

    Returns:
        t: [n, 2] ray parameters of the two hits (NaN on miss).
        points: [n, 2, 3] world-space intersection points (NaN on miss).
    """
    radius = jnp.asarray(sphere_radius, dtype=origin.dtype).reshape(())
    oc = origin  # sphere centered at 0: origin - center == origin
    b = 2.0 * jnp.sum(direction * oc, axis=1)
    c = jnp.sum(oc * oc, axis=1) - radius**2
    a = jnp.sum(direction * direction, axis=1)
    t = solve_quadratic_equation(a, b, c).T  # [n, 2]
    points = origin[:, None, :] + t[:, :, None] * direction[:, None, :]
    return t, points
