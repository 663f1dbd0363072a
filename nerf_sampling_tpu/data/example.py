"""Synthetic example dataset: an analytically-rendered sphere scene.

Fills the role of the reference's ``download_example_data.sh`` (which wgets
tiny_nerf data — impossible in a zero-egress environment): a procedural
blender-format scene that NeRF can actually learn, used by the e2e tests,
the CLI demos, and bench.py.

Scene: a lambertian sphere of radius 0.9 at the origin, albedo keyed to the
surface normal, lit from a fixed direction, on a white background. Cameras
orbit at radius 4 (matching blender-synthetic conventions: near=2, far=6,
content inside DepthNet's r=2 bounding sphere).
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_sampling_tpu.core.rays import get_rays_np
from nerf_sampling_tpu.data.blender import pose_spherical
from nerf_sampling_tpu.data.types import SceneData

_SPHERE_R = 0.9
_LIGHT = np.array([0.577, 0.577, 0.577], dtype=np.float32)
_CAMERA_ANGLE_X = 0.6911112070083618  # standard blender-synthetic FOV

# the "multi" (hard) variant: three spheres of different sizes, all inside
# DepthNet's r=2 bounding sphere, with high-frequency procedural albedo —
# a much harder target than the single lambertian sphere (multiple argmax
# depths per view direction, occlusions, fine texture detail)
_MULTI_OBJECTS = (
    (np.array([-0.70, -0.35, -0.20], np.float32), 0.55,
     np.array([0.95, 0.35, 0.30], np.float32)),
    (np.array([0.65, 0.05, 0.25], np.float32), 0.50,
     np.array([0.30, 0.55, 0.95], np.float32)),
    (np.array([0.05, 0.70, -0.40], np.float32), 0.40,
     np.array([0.35, 0.90, 0.45], np.float32)),
)
_TEX_FREQ = 14.0


def _trace_rays(ro: np.ndarray, rd: np.ndarray, variant: str) -> np.ndarray:
    """Shade flat rays analytically -> [N, 3] float32 (white background)."""
    d = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    if variant == "sphere":
        objects = ((np.zeros(3, np.float32), _SPHERE_R, None),)
    elif variant == "multi":
        objects = _MULTI_OBJECTS
    else:
        raise ValueError(f"unknown example variant: {variant}")

    n_rays = ro.shape[0]
    best_t = np.full(n_rays, np.inf, np.float32)
    rgb = np.ones((n_rays, 3), np.float32)
    for center, radius, base in objects:
        oc = ro - center
        b = 2 * np.sum(d * oc, -1)
        c = np.sum(oc * oc, -1) - radius**2
        disc = b * b - 4 * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2.0, np.inf)
        closer = hit & (t > 1e-3) & (t < best_t)
        # shade with a finite placeholder t for missing rays (their shading
        # is discarded by the `closer` select below) — inf*d would put
        # +inf/-inf into p and make the lambert dot reduce emit NaN
        # RuntimeWarnings that pollute clean artifacts
        p = ro + np.where(np.isfinite(t), t, 0.0)[:, None] * d
        n = (p - center) / radius
        if base is None:  # classic variant: normal-keyed color
            albedo = 0.5 + 0.5 * n
        else:  # hard variant: high-frequency 3D checker over a base color
            tex = (
                np.sin(_TEX_FREQ * p[:, 0])
                * np.sin(_TEX_FREQ * p[:, 1])
                * np.sin(_TEX_FREQ * p[:, 2])
            )
            albedo = base * (0.55 + 0.45 * np.sign(tex)[:, None])
        lambert = np.clip(np.sum(n * _LIGHT, -1, keepdims=True), 0.15, 1.0)
        shaded = albedo * lambert
        rgb = np.where(closer[:, None], shaded, rgb)
        best_t = np.where(closer, t, best_t)
    return rgb.astype(np.float32)


def _render_analytic(
    H: int, W: int, focal: float, c2w: np.ndarray, variant: str = "sphere"
) -> np.ndarray:
    """Ray-trace the scene analytically -> [H, W, 3] float32."""
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    ro, rd = get_rays_np(H, W, K, c2w.astype(np.float32)[:3, :4])
    rgb = _trace_rays(ro.reshape(-1, 3), rd.reshape(-1, 3), variant)
    return rgb.reshape(H, W, 3)


def _orbit_poses(n: int, seed: int, phi_range=(-60.0, -10.0)) -> np.ndarray:
    rng = np.random.default_rng(seed)
    thetas = rng.uniform(-180, 180, n)
    phis = rng.uniform(*phi_range, n)
    return np.stack([pose_spherical(t, p, 4.0) for t, p in zip(thetas, phis)], 0)


def make_example_scene(
    H: int = 100,
    W: int = 100,
    n_train: int = 20,
    n_val: int = 2,
    n_test: int = 4,
    variant: str = "sphere",
) -> SceneData:
    """In-memory SceneData (no disk I/O) for tests and bench."""
    focal = 0.5 * W / np.tan(0.5 * _CAMERA_ANGLE_X)
    poses = np.concatenate(
        [_orbit_poses(n_train, 0), _orbit_poses(n_val, 1), _orbit_poses(n_test, 2)], 0
    ).astype(np.float32)
    images = np.stack(
        [_render_analytic(H, W, focal, p, variant) for p in poses], 0
    )
    render_poses = np.stack(
        [pose_spherical(a, -30.0, 4.0) for a in np.linspace(-180, 180, 41)[:-1]], 0
    )
    n = n_train + n_val
    return SceneData(
        images=images,
        poses=poses,
        render_poses=render_poses,
        hwf=(H, W, focal),
        i_train=np.arange(n_train),
        i_val=np.arange(n_train, n),
        i_test=np.arange(n, n + n_test),
        near=2.0,
        far=6.0,
    )


def generate_example_dataset(
    basedir: str,
    H: int = 100,
    W: int = 100,
    n_train: int = 100,
    n_val: int = 10,
    n_test: int = 4,
    variant: str = "sphere",
) -> str:
    """Write the example scene to disk in blender transforms_*.json format.

    The result loads through load_blender_data unchanged, so the whole CLI
    stack can be exercised without external data. ``variant="multi"`` is the
    hard proxy scene (3 occluding spheres, high-frequency checker albedo).

    n_train defaults to 100 to match the blender-synthetic convention the
    reference trains on (lego: 100 train views). With only ~20 views the
    DepthNet's origin tower memorizes the per-view-constant ray origins and
    its depth predictions do not generalize to held-out views (measured:
    17x higher fg depth-MSE on test views than train views at 20 views).
    """
    import imageio.v2 as imageio

    focal = 0.5 * W / np.tan(0.5 * _CAMERA_ANGLE_X)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    os.makedirs(basedir, exist_ok=True)
    for si, (split, n) in enumerate(counts.items()):
        os.makedirs(os.path.join(basedir, split), exist_ok=True)
        poses = _orbit_poses(n, si)
        frames = []
        for i, pose in enumerate(poses):
            rgb = _render_analytic(H, W, focal, pose, variant)
            rgba = np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)
            fname = f"{split}/r_{i}"
            imageio.imwrite(
                os.path.join(basedir, fname + ".png"),
                (rgba * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": f"./{fname}", "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": _CAMERA_ANGLE_X, "frames": frames}
        with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as fp:
            json.dump(meta, fp)
    return basedir
