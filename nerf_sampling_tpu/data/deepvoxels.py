"""DeepVoxels dataset loader.

Parity target: reference load_deepvoxels.py:6-134 + DeepvoxelsTrainer
(trainers/deepvoxels.py:44-58): intrinsics.txt parsing, per-split pose
dirs, hemisphere-derived near/far.
"""

from __future__ import annotations

import os

import numpy as np

from nerf_sampling_tpu.data.types import SceneData


def _parse_intrinsics(filepath: str, trgt_sidelength: int, invert_y: bool = False):
    with open(filepath, "r") as file:
        f, cx, cy = list(map(float, file.readline().split()))[:3]
        grid_barycenter = np.array(list(map(float, file.readline().split())))
        near_plane = float(file.readline())
        scale = float(file.readline())
        height, width = map(float, file.readline().split())
        try:
            world2cam_poses = int(file.readline())
        except ValueError:
            world2cam_poses = None
    world2cam_poses = bool(world2cam_poses) if world2cam_poses is not None else False

    cx = cx / width * trgt_sidelength
    cy = cy / height * trgt_sidelength
    f = trgt_sidelength / height * f
    fy = -f if invert_y else f
    full_intrinsic = np.array(
        [[f, 0.0, cx, 0.0], [0.0, fy, cy, 0], [0.0, 0, 1, 0], [0, 0, 0, 1]]
    )
    return full_intrinsic, grid_barycenter, scale, near_plane, world2cam_poses


def _load_pose(filename: str) -> np.ndarray:
    nums = open(filename).read().split()
    return np.array([float(x) for x in nums]).reshape([4, 4]).astype(np.float32)


def _dir2poses(posedir: str) -> np.ndarray:
    poses = np.stack(
        [
            _load_pose(os.path.join(posedir, f))
            for f in sorted(os.listdir(posedir))
            if f.endswith("txt")
        ],
        0,
    )
    transf = np.array(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1.0]]
    )
    poses = poses @ transf
    return poses[:, :3, :4].astype(np.float32)


def _load_split_imgs(imgdir: str, skip: int = 1) -> np.ndarray:
    import imageio.v2 as imageio

    files = [f for f in sorted(os.listdir(imgdir)) if f.endswith("png")]
    return np.stack(
        [imageio.imread(os.path.join(imgdir, f)) / 255.0 for f in files[::skip]], 0
    ).astype(np.float32)


def load_dv_data(scene: str = "cube", basedir: str = "/data/deepvoxels", testskip: int = 8):
    """(imgs, poses, render_poses, [H, W, focal], i_split) — reference
    load_deepvoxels.py:6-134."""
    H = W = 512
    base = f"{basedir}/train/{scene}/"
    full_intrinsic, *_ = _parse_intrinsics(os.path.join(base, "intrinsics.txt"), H)
    focal = full_intrinsic[0, 0]

    poses = _dir2poses(os.path.join(base, "pose"))
    testposes = _dir2poses(f"{basedir}/test/{scene}/pose")[::testskip]
    valposes = _dir2poses(f"{basedir}/validation/{scene}/pose")[::testskip]

    imgs = _load_split_imgs(os.path.join(base, "rgb"))
    testimgs = _load_split_imgs(f"{basedir}/test/{scene}/rgb", testskip)
    valimgs = _load_split_imgs(f"{basedir}/validation/{scene}/rgb", testskip)

    all_imgs = [imgs, valimgs, testimgs]
    counts = np.cumsum([0] + [x.shape[0] for x in all_imgs])
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]

    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate([poses, valposes, testposes], 0)
    render_poses = testposes
    return imgs, poses, render_poses, [H, W, focal], i_split


def load_deepvoxels_scene(cfg) -> SceneData:
    """DeepvoxelsTrainer.load_data semantics -> SceneData."""
    images, poses, render_poses, hwf, i_split = load_dv_data(
        scene=cfg.shape, basedir=cfg.datadir, testskip=cfg.testskip
    )
    print("Loaded deepvoxels", images.shape, render_poses.shape, hwf, cfg.datadir)
    hemi_R = float(np.mean(np.linalg.norm(poses[:, :3, -1], axis=-1)))
    near, far = hemi_R - 1.0, hemi_R + 1.0
    cfg.near, cfg.far = near, far
    return SceneData(
        images=images,
        poses=poses,
        render_poses=render_poses,
        hwf=(int(hwf[0]), int(hwf[1]), float(hwf[2])),
        i_train=i_split[0],
        i_val=i_split[1],
        i_test=i_split[2],
        near=near,
        far=far,
    )
