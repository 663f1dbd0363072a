"""Blender synthetic dataset loader (transforms_*.json + PNGs).

Parity target: reference load_blender.py:32-103 — same splits, testskip,
focal from camera_angle_x, 40 spherical render poses (theta in [-180,180),
phi=-30, r=4), optional half-res via cv2 INTER_AREA.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_sampling_tpu.data.types import SceneData


def _trans_t(t: float) -> np.ndarray:
    return np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]], dtype=np.float32
    )


def _rot_phi(phi: float) -> np.ndarray:
    return np.array(
        [
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def _rot_theta(th: float) -> np.ndarray:
    return np.array(
        [
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Camera-to-world for a spherical orbit pose (reference load_blender.py:32-43)."""
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ c2w


def load_blender_data(
    basedir: str, half_res: bool = False, testskip: int = 1
) -> SceneData:
    """Load a blender-format scene (reference load_blender.py:46-103).

    Keeps all 4 RGBA channels; white-background compositing is the trainer's
    choice via SceneData.composite_white_background().
    """
    import imageio.v2 as imageio

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json"), "r") as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_poses = np.stack(
        [pose_spherical(angle, -30.0, 4.0) for angle in np.linspace(-180, 180, 41)[:-1]],
        0,
    )

    if half_res:
        import cv2

        H, W = H // 2, W // 2
        focal = focal / 2.0
        imgs_half = np.zeros((imgs.shape[0], H, W, imgs.shape[-1]), dtype=np.float32)
        for i, img in enumerate(imgs):
            imgs_half[i] = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        imgs = imgs_half

    return SceneData(
        images=imgs,
        poses=poses,
        render_poses=render_poses,
        hwf=(int(H), int(W), focal),
        i_train=i_split[0],
        i_val=i_split[1],
        i_test=i_split[2],
        near=2.0,
        far=6.0,
    )
