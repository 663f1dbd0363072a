"""LLFF forward-facing dataset loader (poses_bounds.npy + images/).

Parity target: reference load_llff.py (343 LoC) + LLFTrainer.load_data
(trainers/LLF.py:45-86): factor-downsampled images, pose recentering,
optional spherification, spiral render path, bd rescale, llffhold test
split, NDC-or-bds bounds. Fixes reference defects: LLFTrainer reads
``self.factor`` it never sets (LLF.py:49) and returns no render_poses
(SURVEY.md §2 defect #2).

One behavioral substitution: the reference's ``_minify`` shells out to
ImageMagick ``mogrify`` (load_llff.py:9-64); this loader downsamples with
cv2 INTER_AREA in-process (same cache-directory layout ``images_{factor}``).
"""

from __future__ import annotations

import os

import numpy as np

from nerf_sampling_tpu.data.types import SceneData


def _minify(basedir: str, factor: int) -> str:
    """Create images_{factor}/ with 1/factor-size PNGs if absent."""
    import cv2
    import imageio.v2 as imageio

    imgdir = os.path.join(basedir, f"images_{factor}")
    if os.path.exists(imgdir):
        return imgdir
    srcdir = os.path.join(basedir, "images")
    files = [
        f
        for f in sorted(os.listdir(srcdir))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    ]
    os.makedirs(imgdir)
    print("Minifying", factor, basedir)
    for f in files:
        img = imageio.imread(os.path.join(srcdir, f))
        h, w = img.shape[:2]
        small = cv2.resize(
            img, (w // factor, h // factor), interpolation=cv2.INTER_AREA
        )
        out = os.path.splitext(f)[0] + ".png"
        imageio.imwrite(os.path.join(imgdir, out), small)
    return imgdir


def _load_data(basedir: str, factor: int | None = None):
    """poses_bounds.npy + (optionally minified) images
    (reference load_llff.py:67-133)."""
    import imageio.v2 as imageio

    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    if factor is not None and factor != 1:
        imgdir = _minify(basedir, factor)
    else:
        factor = 1
        imgdir = os.path.join(basedir, "images")

    imgfiles = [
        os.path.join(imgdir, f)
        for f in sorted(os.listdir(imgdir))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    ]
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(
            f"Mismatch between imgs {len(imgfiles)} and poses {poses.shape[-1]}"
        )

    sh = imageio.imread(imgfiles[0]).shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor

    imgs = [imageio.imread(f)[..., :3] / 255.0 for f in imgfiles]
    imgs = np.stack(imgs, -1)
    return poses, bds, imgs


def normalize(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x)


def viewmatrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    vec2 = normalize(z)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def render_path_spiral(c2w, up, rads, focal, zrate, rots, N):
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0])
            * rads,
        )
        z = normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return render_poses


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    poses_44 = np.concatenate([poses[:, :3, :4], bottom], -2)
    poses_44 = np.linalg.inv(c2w) @ poses_44
    poses_[:, :3, :4] = poses_44[:, :3, :4]
    return poses_


def spherify_poses(poses, bds):
    """Re-center 360 captures on the point nearest all camera axes and build
    a circular render path (reference load_llff.py:198-264)."""
    p34_to_44 = lambda p: np.concatenate(
        [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])], 1
    )
    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -A_i @ rays_o
    pt_mindist = np.squeeze(
        -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0)) @ (b_i).mean(0)
    )

    center = pt_mindist
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = normalize(up)
    vec1 = normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad**2 - zh**2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array([radcircle * np.cos(th), radcircle * np.sin(th), zh])
        up = np.array([0, 0, -1.0])
        vec2 = normalize(camorigin)
        vec0 = normalize(np.cross(vec2, up))
        vec1 = normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)
    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)],
        -1,
    )
    poses_reset = np.concatenate(
        [
            poses_reset[:, :3, :4],
            np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape),
        ],
        -1,
    )
    return poses_reset, new_poses, bds


def load_llff_data(
    basedir: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: float | None = 0.75,
    spherify: bool = False,
):
    """(images, poses[3x5], bds, render_poses, i_test) — reference
    load_llff.py:267-343 semantics."""
    poses, bds, imgs = _load_data(basedir, factor=factor)
    print("Loaded", basedir, bds.min(), bds.max())

    # Rotation-column reorder (LLFF [down right back] -> [right up back])
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    images = np.moveaxis(imgs, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / (((1.0 - dt) / close_depth + dt / inf_depth))
        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        render_poses = render_path_spiral(
            c2w, up, rads, focal, zrate=0.5, rots=2, N=120
        )

    render_poses = np.array(render_poses).astype(np.float32)
    c2w = poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))
    print("HOLDOUT view is", i_test)
    return images, poses, bds, render_poses, i_test


def load_llff_scene(cfg) -> SceneData:
    """LLFTrainer.load_data semantics (LLF.py:45-86) -> SceneData."""
    images, poses, bds, render_poses, i_test = load_llff_data(
        cfg.datadir,
        cfg.factor,
        recenter=True,
        bd_factor=0.75,
        spherify=cfg.spherify,
    )
    hwf = poses[0, :3, -1]
    poses = poses[:, :3, :4]
    i_test = [i_test]
    if cfg.llffhold > 0:
        print("Auto LLFF holdout,", cfg.llffhold)
        i_test = np.arange(images.shape[0])[:: cfg.llffhold]
    i_test = np.asarray(i_test)
    i_val = i_test
    i_train = np.array(
        [i for i in np.arange(images.shape[0]) if i not in i_test]
    )
    if cfg.no_ndc:
        near, far = float(bds.min()) * 0.9, float(bds.max()) * 1.0
    else:
        near, far = 0.0, 1.0
    print("NEAR FAR", near, far)
    cfg.near, cfg.far = near, far
    # 4th render-pose column carries hwf in llff convention; strip to 3x4
    render_poses = render_poses[:, :3, :4]
    return SceneData(
        images=images,
        poses=poses,
        render_poses=render_poses,
        hwf=(int(hwf[0]), int(hwf[1]), float(hwf[2])),
        i_train=i_train,
        i_val=i_val,
        i_test=i_test,
        near=near,
        far=far,
    )
