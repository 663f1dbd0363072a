"""Scene-level calibration glue for mlp_impl="pallas_int8".

Bridges a loaded checkpoint + SceneData to the static QuantCalib the
int8 fused kernels need (kernels.quant): rays come from a training view
(the same camera geometry every render/train batch uses), so the
calibrated activation ranges cover the points the kernels will query.
Callers (experiments CLIs, trainer, bench) run this ONCE per checkpoint
after restore, then carry the returned Pipeline.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nerf_sampling_tpu.core.rays import get_rays_np
from nerf_sampling_tpu.kernels.quant import calibrate_nerf_quant
from nerf_sampling_tpu.render.engine import NeRFParams, Pipeline


def _scene_rays(scene, n_rays: int) -> tuple[np.ndarray, np.ndarray]:
    H, W, focal = scene.hwf
    H, W = int(H), int(W)
    K = scene.K
    if K is None:
        K = np.array(
            [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32
        )
    view = int(scene.i_train[0]) if len(scene.i_train) else 0
    c2w = np.asarray(scene.poses[view][:3, :4], np.float32)
    ro, rd = get_rays_np(H, W, K, c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    idx = np.linspace(0, ro.shape[0] - 1, min(n_rays, ro.shape[0])).astype(int)
    return ro[idx], rd[idx]


def calibrate_pipeline(
    pipeline: Pipeline,
    params: NeRFParams,
    scene,
    n_rays: int = 512,
) -> Pipeline:
    """Attach (coarse, fine) QuantCalibs from a scene's first train view.

    No-op unless pipeline.mlp_impl == "pallas_int8". The calibration is
    tied to ``params`` — recalibrate after loading a different checkpoint.
    """
    if pipeline.mlp_impl != "pallas_int8":
        return pipeline
    ro, rd = _scene_rays(scene, n_rays)
    kw = dict(
        near=pipeline.near,
        far=pipeline.far,
        multires=pipeline.multires,
        multires_views=pipeline.multires_views,
    )
    qc = calibrate_nerf_quant(params.coarse, pipeline.nerf, ro, rd, **kw)
    qf = (
        calibrate_nerf_quant(params.fine, pipeline.fine, ro, rd, **kw)
        if params.fine is not None
        else qc
    )
    return dataclasses.replace(pipeline, quant_calib=(qc, qf))
