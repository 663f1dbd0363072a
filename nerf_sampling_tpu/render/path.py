"""Pose-path rendering harness: PSNR, PNG/psnr.txt artifacts, scene data.

Parity target: reference nerf_utils.py:258-390 (render_path + log_wandb).
Host-side orchestration; per-pose rendering stays on device via
render_image's single jit program.
"""

from __future__ import annotations

import os
import time
from typing import Any, Sequence

import jax
import numpy as np

from nerf_sampling_tpu.core.metrics import psnr_np, to8b
from nerf_sampling_tpu.render.engine import EvalMode, NeRFParams, Pipeline, render_image


def render_path(
    pipeline: Pipeline,
    params: NeRFParams,
    render_poses: Sequence[np.ndarray],
    hwf: tuple[int, int, float],
    K: np.ndarray,
    key: jax.Array,
    *,
    mode: EvalMode = EvalMode.DEPTH_NET,
    chunk: int = 1024 * 32,
    gt_imgs: np.ndarray | None = None,
    savedir: str | None = None,
    render_factor: int = 0,
    save_scene_data: bool = False,
    step: int = 0,
    logger: Any = None,
    verbose: bool = True,
    mesh: Any = None,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Render every pose; return (rgbs [P,H,W,3], disps [P,H,W], avg_psnr).

    Artifacts mirror the reference: per-image PNGs, psnr.txt with per-image
    and average lines (+ MSE when mode==COMPARE_NERF), scene_data point cloud.
    """
    import imageio.v2 as imageio

    H, W, focal = hwf
    if render_factor != 0:
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor
        K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])

    rgbs, disps = [], []
    all_pts, all_weights = [], []
    total_psnr, total_mse = 0.0, 0.0
    n_poses = len(render_poses)
    t = time.time()

    for i, c2w in enumerate(render_poses):
        if verbose:
            print(i, time.time() - t)
        t = time.time()
        render_kwargs = dict(
            mode=mode,
            chunk=chunk,
            # scene-data export needs per-sample pts/weights, which the
            # fused fast paths do not materialize
            full_outputs=save_scene_data,
        )
        if mesh is not None:
            from nerf_sampling_tpu.parallel.render import render_image_sharded

            maps = render_image_sharded(
                pipeline, params, H, W,
                np.asarray(K, np.float32),
                np.asarray(c2w[:3, :4], np.float32),
                jax.random.fold_in(key, i), mesh, **render_kwargs,
            )
        else:
            maps = render_image(
                pipeline, params, H, W,
                np.asarray(K, np.float32),
                np.asarray(c2w[:3, :4], np.float32),
                jax.random.fold_in(key, i), **render_kwargs,
            )
        rgb = np.asarray(maps["depth_net_rgb_map"])
        disp = np.asarray(maps["depth_net_disp_map"])
        rgbs.append(rgb)
        disps.append(disp)

        psnr_info = None
        if gt_imgs is not None and render_factor == 0:
            psnr = psnr_np(rgb, np.asarray(gt_imgs[i]))
            psnr_info = f"{i:03d}.png, PSNR: {psnr}"
            if mode == EvalMode.COMPARE_NERF:
                mse = float(
                    np.mean(
                        (
                            np.asarray(maps["max_z_vals"])
                            - np.asarray(maps["depth_net_z_vals"])
                        )
                        ** 2
                    )
                )
                total_mse += mse
                psnr_info += f", MSE: {mse}"
            total_psnr += psnr
            if verbose:
                print(psnr_info)

        if savedir is not None:
            imageio.imwrite(os.path.join(savedir, f"{i:03d}.png"), to8b(rgb))
            if psnr_info is not None:
                f = os.path.join(savedir, "psnr.txt")
                with open(f, "a") as file:
                    file.write(f"{psnr_info}\n")
                if i == n_poses - 1:
                    to_write = (
                        f"Avg of {n_poses} images:\nPSNR: {total_psnr / n_poses}\n"
                    )
                    if total_mse > 0:
                        to_write += f"MSE: {total_mse / n_poses}"
                    with open(f, "a") as file:
                        file.write(to_write)
            if save_scene_data:
                pts = np.asarray(maps["depth_net_pts"]).reshape(-1, 3)
                weights = np.asarray(maps["depth_net_weights"]).reshape(-1)
                all_pts.append(pts)
                all_weights.append(weights)

        if logger is not None:
            # ray geometry for the reference's 3D ray plots (log_wandb,
            # nerf_utils.py:363-390); regenerated on host — eval cadence only
            from nerf_sampling_tpu.core.rays import get_rays_np

            ro, rd = get_rays_np(H, W, np.asarray(K), np.asarray(c2w[:3, :4]))
            logger.log_render(maps, i, step, rays_o=ro, rays_d=rd)

    if save_scene_data and savedir is not None:
        scene_data = {
            "all_pts": np.concatenate(all_pts),
            "all_weights": np.concatenate(all_weights),
        }
        np.savez(os.path.join(savedir, "scene_data.npz"), **scene_data)

    rgbs = np.stack(rgbs, 0)
    disps = np.stack(disps, 0)
    avg = total_psnr / n_poses if gt_imgs is not None and render_factor == 0 else 0.0
    return rgbs, disps, avg
