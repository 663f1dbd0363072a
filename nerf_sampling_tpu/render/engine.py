"""Core rendering: hierarchical NeRF sampling + DepthNet single-query path.

Parity targets (behavior, not structure):
- train path:  reference nerf_utils.py:497-733 (sample_as_in_NeRF + render_rays)
- eval path:   reference nerf_utils.py:736-876 (render_rays_test, 4 modes)
- full image:  reference nerf_utils.py:58-85,88-255 (batchify_rays + render)

TPU-first design:
- Everything below ``render_image`` is a pure function of
  (pipeline: static config, params: pytree, rays: arrays, key) and compiles
  to one XLA program — no Python chunk loops, no host sync inside the step.
- ``render_image`` replaces the reference's Python ``batchify_rays`` loop with
  a ``lax.map`` over fixed-size ray tiles (static shapes; the compiler
  pipelines HBM traffic across tiles), or a single fused call when the batch
  fits. Multi-chip sharding lives in nerf_sampling_tpu.parallel and wraps
  these same functions with pjit — rendering is embarrassingly parallel over
  rays.
- The eval "modes" are Python-level enum dispatch: each mode is its own jit
  specialization (XLA cannot branch on shape-changing paths at runtime).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from nerf_sampling_tpu.core.compositing import RenderOutputs, raw2outputs
from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.core.rays import get_rays, ndc_rays
from nerf_sampling_tpu.core.sampling import (
    sample_pdf,
    sample_points_around_mean,
    stratified_z_vals,
    z_to_points,
)
from nerf_sampling_tpu.models.depth_net import DepthNetConfig, depth_net_apply
from nerf_sampling_tpu.models.nerf import NeRFConfig, nerf_apply


# mlp_impl values that route eligible work onto the fused Pallas kernels
PALLAS_IMPLS = ("pallas", "pallas_int8")


class EvalMode(enum.Enum):
    """Test-time rendering modes (reference render_rays_test, nerf_utils.py:788-865)."""

    DEPTH_NET = "depth_net"  # DepthNet depth -> populate N samples -> NeRF
    COMPARE_NERF = "compare_nerf"  # DEPTH_NET + full-NeRF argmax diagnostics
    NERF_MAX = "nerf_max"  # render from the argmax-weight sample only
    FULL_NERF = "full_nerf"  # vanilla hierarchical NeRF render


class NeRFParams(NamedTuple):
    """Dynamic parameter bundle (a pytree; any leaf may be None)."""

    coarse: Any
    fine: Any = None
    depth: Any = None


class RayBatch(NamedTuple):
    """Unpacked equivalent of the reference's 11-column ray batch
    (prepare_rays, nerf_utils.py:156-188)."""

    rays_o: jnp.ndarray  # [N, 3]
    rays_d: jnp.ndarray  # [N, 3]
    viewdirs: jnp.ndarray | None  # [N, 3] unit, or None
    near: jnp.ndarray  # [N, 1]
    far: jnp.ndarray  # [N, 1]


@dataclasses.dataclass(frozen=True)
class Pipeline:
    """Static rendering configuration — hashable, safe as a jit static arg."""

    nerf: NeRFConfig
    fine: NeRFConfig | None = None
    depth: DepthNetConfig | None = None
    multires: int = 10
    multires_views: int = 4
    i_embed: int = 0  # -1 disables positional encoding (reference get_embedder)
    N_samples: int = 64
    N_importance: int = 128
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    white_bkgd: bool = True
    lindisp: bool = False
    use_viewdirs: bool = True
    ndc: bool = False
    near: float = 2.0
    far: float = 6.0
    # Image geometry for the NDC reprojection (ndc_rays needs H/W/focal).
    # Set by the trainer from the loaded scene when ndc=True, so training
    # steps — which see only flat ray batches — can reproject; explicit
    # H/W/focal arguments to make_ray_batch still win (full-image renders).
    H: int | None = None
    W: int | None = None
    focal: float | None = None
    # eval-time depth population (reference render.py:208-212 defaults)
    n_depth_samples: int = 2
    sampling_mode: str = "uniform"
    distance: float = 0.01
    # EXTENSION (no reference analog; 1.0 = exact reference objective):
    # down-weights the depth-MSE of background rays (hierarchical
    # acc <= 0.5) in depth-net training. Measured r3: 85% of the
    # reference objective's magnitude is background argmax NOISE after
    # ~10k iters, driving the post-peak eval drift (RESULTS.md); 0.0
    # trains the depth head on foreground geometry only.
    bg_depth_loss_weight: float = 1.0
    # EXTENSION (no reference analog; 0 = off): in JOINT training, hold the
    # depth net frozen (and drop its loss terms) for the first N steps so
    # the NeRF stabilizes before the depth net starts fitting max_z.
    # Measured r4: from-scratch joint training collapses the depth net in
    # the first few hundred steps (argmax targets of a random NeRF are
    # noise) and it never recovers — a warmup gives from-scratch joint the
    # same dynamics as the working pretrain->joint-fine-tune recipe.
    joint_depth_warmup: int = 0
    # MLP execution backend: "xla" (fp32 HIGHEST, differentiable — training
    # and parity), "pallas" (fused bf16 VMEM-resident kernel, eval only;
    # ~4.3x the fp32 path on v5e), or "pallas_int8" (the W8A8 variant of
    # the fused EVAL kernels — kernels.quant; measured ~1.15x the bf16
    # trunk on v5e). The fused eval paths have no VJP; under "pallas_int8"
    # the DIFFERENTIABLE query (training) stays on the bf16 custom-VJP
    # kernel — int8 applies to eval renders and no-gradient passes (the
    # depth-train frozen-NeRF oracle).
    mlp_impl: str = "xla"
    # Static calibration for "pallas_int8": a kernels.quant.QuantCalib, or
    # a (coarse, fine) pair of them. Produce with
    # render.quantize.calibrate_pipeline (scene-level) or
    # kernels.quant.calibrate_nerf_quant (raw rays). Tied to the
    # calibrated checkpoint.
    quant_calib: Any = None
    # Max points per XLA MLP evaluation (reference netchunk,
    # nerf_utils.py:926-929): bounds the [M, 90] embedding + [M, 256]
    # activation footprint via an in-jit lax.map. The pallas kernel needs no
    # such bound (activations never leave VMEM).
    netchunk: int = 1024 * 64

    def embed_pts(self, pts: jnp.ndarray) -> jnp.ndarray:
        if self.i_embed == -1:
            return pts
        return positional_encoding(pts, self.multires)

    def embed_dirs(self, dirs: jnp.ndarray) -> jnp.ndarray:
        if self.i_embed == -1:
            return dirs
        return positional_encoding(dirs, self.multires_views)


def make_ray_batch(
    pipeline: Pipeline,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    H: int | None = None,
    W: int | None = None,
    focal: float | None = None,
) -> RayBatch:
    """Normalize viewdirs, optionally reproject to NDC, attach bounds.

    Mirrors reference prepare_rays (nerf_utils.py:156-188): viewdirs are the
    pre-NDC directions; near/far come from the pipeline scalars.
    """
    viewdirs = None
    if pipeline.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    if pipeline.ndc:
        H = H if H is not None else pipeline.H
        W = W if W is not None else pipeline.W
        focal = focal if focal is not None else pipeline.focal
        if focal is None or H is None or W is None:
            raise ValueError(
                "NDC reprojection needs H/W/focal — pass them to "
                "make_ray_batch or set them on the Pipeline"
            )
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    near = pipeline.near * jnp.ones_like(rays_d[..., :1])
    far = pipeline.far * jnp.ones_like(rays_d[..., :1])
    return RayBatch(rays_o, rays_d, viewdirs, near, far)


def query_nerf(
    pipeline: Pipeline,
    params: Any,
    cfg: NeRFConfig,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray | None,
    *,
    input_grads: bool = True,
) -> jnp.ndarray:
    """Embed points (+dirs) and evaluate one NeRF MLP.

    Equivalent of reference run_network (Trainer.py:789-806) minus the
    netchunk loop — under jit the whole [N*S, feat] batch is one fused
    matmul chain on the MXU; memory is bounded by the caller's ray tiling.

    ``input_grads=False`` lets the Pallas custom-VJP path skip the whole
    dL/d(pts, viewdirs) chain in its backward kernel. It is ONLY valid
    when the loss does not differentiate through the inputs; callers that
    might (e.g. the depth-point query driving DepthNet gradients) must
    keep the default True.
    """
    if (
        pipeline.mlp_impl in PALLAS_IMPLS
        and cfg.use_viewdirs
        and viewdirs is not None
        and pipeline.i_embed != -1
    ):
        # the custom-VJP variant: forward-identical to the inference kernel,
        # differentiable w.r.t. params always, and w.r.t. pts/viewdirs when
        # input_grads=True (recompute backward kernel) — training steps can
        # stay on the fused path end to end
        from nerf_sampling_tpu.kernels.fused_nerf_vjp import (
            fused_nerf_train_apply,
        )

        return fused_nerf_train_apply(
            params,
            cfg,
            pts,
            viewdirs[:, None, :],
            pipeline.multires,
            pipeline.multires_views,
            interpret=jax.default_backend() == "cpu",
            input_grads=input_grads,
        )
    if viewdirs is not None:
        dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
        flat_in = jnp.concatenate([pts, dirs], -1).reshape(-1, 6)
    else:
        flat_in = pts.reshape(-1, 3)

    def apply_chunk(chunk_in: jnp.ndarray) -> jnp.ndarray:
        emb = pipeline.embed_pts(chunk_in[..., :3])
        if viewdirs is not None:
            emb = jnp.concatenate(
                [emb, pipeline.embed_dirs(chunk_in[..., 3:6])], -1
            )
        return nerf_apply(params, cfg, emb)

    m = flat_in.shape[0]
    out_ch = 4 if cfg.use_viewdirs else cfg.output_ch
    if m <= pipeline.netchunk:
        raw = apply_chunk(flat_in)
    else:
        flat_in = _pad_to_multiple(flat_in, pipeline.netchunk)
        tiles = flat_in.reshape(-1, pipeline.netchunk, flat_in.shape[-1])
        raw = jax.lax.map(apply_chunk, tiles).reshape(-1, out_ch)[:m]
    return raw.reshape(*pts.shape[:-1], out_ch)


class HierarchicalResult(NamedTuple):
    """Coarse + fine sampling outputs (reference sample_as_in_NeRF returns)."""

    coarse: RenderOutputs
    coarse_z_vals: jnp.ndarray  # [N, Nc]
    fine: RenderOutputs  # == coarse when N_importance == 0
    fine_z_vals: jnp.ndarray  # [N, Nc+Nf]
    fine_pts: jnp.ndarray  # [N, Nc+Nf, 3]
    fine_raw: jnp.ndarray  # [N, Nc+Nf, 4]


def sample_as_in_nerf(
    pipeline: Pipeline,
    params: NeRFParams,
    rays: RayBatch,
    key: jax.Array,
    *,
    perturb: float | None = None,
    raw_noise_std: float | None = None,
) -> HierarchicalResult:
    """Hierarchical coarse+fine sampling (reference nerf_utils.py:497-611).

    perturb / raw_noise_std default to the pipeline values; eval passes 0.
    """
    perturb = pipeline.perturb if perturb is None else perturb
    raw_noise_std = pipeline.raw_noise_std if raw_noise_std is None else raw_noise_std
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    # --- coarse stage (reference Trainer.sample_coarse_points, :579-649)
    z_vals = stratified_z_vals(
        rays.near,
        rays.far,
        pipeline.N_samples,
        key=k_strat,
        perturb=perturb,
        lindisp=pipeline.lindisp,
    )
    pts = z_to_points(rays.rays_o, rays.rays_d, z_vals)
    # the hierarchical losses never differentiate through the sample points
    # (z detached per reference Trainer.py:572, rays are data) — let the
    # Pallas backward drop its dL/dx chain
    raw = query_nerf(
        pipeline, params.coarse, pipeline.nerf, pts, rays.viewdirs,
        input_grads=False,
    )
    coarse = raw2outputs(
        raw, z_vals, rays.rays_d, raw_noise_std, pipeline.white_bkgd, key=k_noise_c
    )

    if pipeline.N_importance <= 0:
        return HierarchicalResult(coarse, z_vals, coarse, z_vals, pts, raw)

    # --- fine stage (reference Trainer.sample_fine_points, :651-710)
    z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(
        z_mids,
        coarse.weights[..., 1:-1],
        pipeline.N_importance,
        key=k_pdf,
        det=(perturb == 0.0),
    )
    z_samples = jax.lax.stop_gradient(z_samples)  # reference detaches (:572)
    # NB the [N, 192] union sort is ~1.4 ms — NOT a bottleneck (a sort-free
    # order-statistics + compare-count-merge variant measured no faster;
    # scripts/ablate_xla_pieces.py). The step's XLA pig was searchsorted.
    fine_z = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
    fine_pts = z_to_points(rays.rays_o, rays.rays_d, fine_z)
    fine_params = params.fine if params.fine is not None else params.coarse
    fine_cfg = pipeline.fine if params.fine is not None else pipeline.nerf
    fine_raw = query_nerf(
        pipeline, fine_params, fine_cfg, fine_pts, rays.viewdirs,
        input_grads=False,
    )
    fine = raw2outputs(
        fine_raw, fine_z, rays.rays_d, raw_noise_std, pipeline.white_bkgd, key=k_noise_f
    )
    return HierarchicalResult(coarse, z_vals, fine, fine_z, fine_pts, fine_raw)


def _argmax_depth(
    fine: RenderOutputs, fine_z: jnp.ndarray, rays: RayBatch
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(max_z_vals [N,1], max_pts [N,1,3], max_weights [N,1]) at argmax weight.

    Reference nerf_utils.py:689-691 / :813-819.
    """
    top = jnp.argmax(fine.weights, axis=1, keepdims=True)
    max_z = jnp.take_along_axis(fine_z, top, axis=1)
    max_w = jnp.take_along_axis(fine.weights, top, axis=1)
    max_pts = z_to_points(rays.rays_o, rays.rays_d, max_z)
    return max_z, max_pts, max_w


def _query_fine_or_coarse(
    pipeline: Pipeline,
    params: NeRFParams,
    pts: jnp.ndarray,
    rays: RayBatch,
    force_xla: bool = False,
) -> jnp.ndarray:
    """NeRF query preferring the fine network (reference nerf_utils.py:696-699).

    force_xla selects the differentiable path regardless of mlp_impl — used
    for the depth-point query whose gradient w.r.t. the input points drives
    DepthNet training (the Pallas kernel has no VJP).
    """
    if force_xla and pipeline.mlp_impl != "xla":
        pipeline = dataclasses.replace(pipeline, mlp_impl="xla")
    if params.fine is not None:
        return query_nerf(pipeline, params.fine, pipeline.fine, pts, rays.viewdirs)
    return query_nerf(pipeline, params.coarse, pipeline.nerf, pts, rays.viewdirs)


def render_rays_train(
    pipeline: Pipeline,
    params: NeRFParams,
    rays: RayBatch,
    key: jax.Array,
) -> dict[str, jnp.ndarray]:
    """Train-time renderer (reference render_rays, nerf_utils.py:614-733).

    Full hierarchical NeRF -> argmax-weight depth target -> DepthNet predicts
    one depth -> NeRF queried at that single point -> composited maps.

    With mlp_impl="pallas" the hierarchical target pass runs on the fused
    kernel: it has no dependence on DepthNet params, so depth-net-only
    training never differentiates it (the reference freezes the NeRF here
    anyway, run.py:101-107). Only the single depth-point query stays on the
    differentiable XLA path (its input-gradient trains DepthNet).
    """
    k_nerf, k_noise = jax.random.split(key)
    hier = sample_as_in_nerf(pipeline, params, rays, k_nerf)
    max_z, max_pts, _ = _argmax_depth(hier.fine, hier.fine_z_vals, rays)
    max_z = jax.lax.stop_gradient(max_z)
    max_pts = jax.lax.stop_gradient(max_pts)

    depth_z = depth_net_apply(params.depth, pipeline.depth, rays.rays_o, rays.rays_d)
    depth_pts = z_to_points(rays.rays_o, rays.rays_d, depth_z)
    depth_raw = _query_fine_or_coarse(pipeline, params, depth_pts, rays, force_xla=True)
    out = raw2outputs(
        depth_raw,
        depth_z,
        rays.rays_d,
        pipeline.raw_noise_std,
        pipeline.white_bkgd,
        key=k_noise,
    )
    return {
        "depth_net_rgb_map": out.rgb_map,
        "depth_net_disp_map": out.disp_map,
        "depth_net_z_vals": depth_z,
        "max_z_vals": max_z,
        "depth_net_pts": depth_pts,
        "max_pts": max_pts,
        "raw": depth_raw,
        # hierarchical accumulated opacity: lets the train step split its
        # depth-loss diagnostics into fg/bg (background argmax targets are
        # sampling noise); not part of the reference's return set
        "acc_map": hier.fine.acc_map,
    }


def render_rays_joint(
    pipeline: Pipeline,
    params: NeRFParams,
    rays: RayBatch,
    key: jax.Array,
) -> dict[str, jnp.ndarray]:
    """Joint renderer: one hierarchical pass feeding BOTH objectives.

    Returns the vanilla NeRF maps (fine rgb + coarse rgb0) and the DepthNet
    maps/targets from the same sampling pass — enabling the joint training
    mode the reference intended but never wired (its NeRF optimizer is
    created, decayed, checkpointed, yet never stepped; SURVEY.md defect #4).
    """
    k_nerf, k_noise = jax.random.split(key)
    hier = sample_as_in_nerf(pipeline, params, rays, k_nerf)
    max_z, max_pts, _ = _argmax_depth(hier.fine, hier.fine_z_vals, rays)
    max_z = jax.lax.stop_gradient(max_z)

    depth_z = depth_net_apply(params.depth, pipeline.depth, rays.rays_o, rays.rays_d)
    depth_pts = z_to_points(rays.rays_o, rays.rays_d, depth_z)
    depth_raw = _query_fine_or_coarse(pipeline, params, depth_pts, rays, force_xla=True)
    out = raw2outputs(
        depth_raw,
        depth_z,
        rays.rays_d,
        pipeline.raw_noise_std,
        pipeline.white_bkgd,
        key=k_noise,
    )
    return {
        "rgb_map": hier.fine.rgb_map,
        "rgb0": hier.coarse.rgb_map,
        "depth_net_rgb_map": out.rgb_map,
        "depth_net_z_vals": depth_z,
        "max_z_vals": max_z,
        # fine accumulated opacity for the fg/bg depth-loss split (see
        # render_rays_train)
        "acc_map": hier.fine.acc_map,
    }


def render_rays_vanilla(
    pipeline: Pipeline,
    params: NeRFParams,
    rays: RayBatch,
    key: jax.Array,
) -> dict[str, jnp.ndarray]:
    """Vanilla hierarchical NeRF train renderer (no DepthNet).

    This is the reference's *intended* vanilla path — present but broken
    there (SURVEY.md §2 defects #1/#4); here it is a first-class citizen so
    NeRFs can be pretrained inside this framework.
    """
    hier = sample_as_in_nerf(pipeline, params, rays, key)
    return {
        "rgb_map": hier.fine.rgb_map,
        "disp_map": hier.fine.disp_map,
        "acc_map": hier.fine.acc_map,
        "rgb0": hier.coarse.rgb_map,
        "disp0": hier.coarse.disp_map,
        "acc0": hier.coarse.acc_map,
    }


def render_rays_eval(
    pipeline: Pipeline,
    params: NeRFParams,
    rays: RayBatch,
    key: jax.Array,
    mode: EvalMode = EvalMode.DEPTH_NET,
) -> dict[str, jnp.ndarray]:
    """Test-time renderer, 4 modes (reference render_rays_test, :736-876).

    Eval uses perturb=0 and raw_noise_std=0 (reference create_nerf
    render_kwargs_test, nerf_utils.py:490-492).
    """
    if mode == EvalMode.COMPARE_NERF and pipeline.mlp_impl in PALLAS_IMPLS:
        # COMPARE is the parity-diagnostic mode. The fused fast path runs
        # it on fp32 kernels (_fused_fast_paths); when a config falls back
        # HERE, keep the same precision contract by using the fp32 XLA
        # path throughout — otherwise the hierarchical max_z target would
        # carry bf16 noise the tightened 3e-4 tolerances assume away.
        pipeline = dataclasses.replace(pipeline, mlp_impl="xla")
    ret: dict[str, jnp.ndarray] = {}

    if mode in (EvalMode.COMPARE_NERF, EvalMode.NERF_MAX, EvalMode.FULL_NERF):
        hier = sample_as_in_nerf(
            pipeline, params, rays, key, perturb=0.0, raw_noise_std=0.0
        )
        max_z, max_pts, max_w = _argmax_depth(hier.fine, hier.fine_z_vals, rays)
        ret["max_z_vals"] = max_z
        ret["max_pts"] = max_pts
        ret["max_weights"] = max_w

    if mode == EvalMode.NERF_MAX:
        # Render from the argmax sample only (reference :824-829).
        rgb = jax.nn.sigmoid(hier.fine_raw[..., :3])
        top = jnp.argmax(hier.fine.weights, axis=1, keepdims=True)
        max_rgb = jnp.take_along_axis(rgb, top[..., None], axis=1)[:, 0, :]
        ret.update(
            depth_net_rgb_map=max_rgb,
            depth_net_disp_map=jnp.zeros_like(max_rgb),
            depth_net_weights=max_w,
            depth_net_pts=max_pts,
            depth_net_z_vals=max_z,
        )
        return ret

    if mode == EvalMode.FULL_NERF:
        ret.update(
            depth_net_rgb_map=hier.fine.rgb_map,
            depth_net_disp_map=hier.fine.disp_map,
            depth_net_weights=hier.fine.weights,
            depth_net_pts=hier.fine_pts,
            depth_net_z_vals=hier.fine_z_vals,
        )
        return ret

    # DEPTH_NET (default) and the depth-net half of COMPARE_NERF (:837-865).
    k_pop, _ = jax.random.split(key)
    if pipeline.mlp_impl in PALLAS_IMPLS:
        from nerf_sampling_tpu.kernels import fused_depth_net_apply

        depth_mean = fused_depth_net_apply(
            params.depth,
            pipeline.depth,
            rays.rays_o,
            rays.rays_d,
            # Never COMPARE_NERF here (replaced with the fp32 XLA pipeline
            # at the top of this function), so production bf16 is safe.
            dtype=jnp.bfloat16,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        depth_mean = depth_net_apply(
            params.depth, pipeline.depth, rays.rays_o, rays.rays_d
        )
    depth_pts, depth_z = sample_points_around_mean(
        rays.rays_o,
        rays.rays_d,
        depth_mean,
        n_samples=pipeline.n_depth_samples,
        mode=pipeline.sampling_mode,
        std=pipeline.distance,
        key=k_pop,
    )
    depth_raw = _query_fine_or_coarse(pipeline, params, depth_pts, rays)
    out = raw2outputs(depth_raw, depth_z, rays.rays_d, 0.0, pipeline.white_bkgd)
    ret.update(
        depth_net_rgb_map=out.rgb_map,
        depth_net_disp_map=out.disp_map,
        depth_net_weights=out.weights,
        depth_net_pts=depth_pts,
        depth_net_z_vals=depth_z,
    )
    return ret


def _pad_to_multiple(x: jnp.ndarray, m: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)


def _quant_pair(pipeline: Pipeline, params: NeRFParams):
    """(coarse, fine) QuantCalibs for mlp_impl="pallas_int8", else Nones.

    A single pipeline.quant_calib applies to both models; with tied
    params (params.fine is None) the fine slot reuses the coarse calib.
    """
    if pipeline.mlp_impl != "pallas_int8":
        return None, None
    q = pipeline.quant_calib
    if q is None:
        raise ValueError(
            "mlp_impl='pallas_int8' needs pipeline.quant_calib — calibrate "
            "the checkpoint first (render.quantize.calibrate_pipeline or "
            "kernels.quant.calibrate_nerf_quant)"
        )
    qc, qf = q if isinstance(q, tuple) else (q, q)
    if params.fine is None:
        qf = qc
    return qc, qf


def _fused_fast_paths(
    pipeline: Pipeline,
    params: NeRFParams,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    mode: EvalMode,
) -> dict[str, jnp.ndarray] | None:
    """Route eligible eval modes to the fused Pallas kernels.

    Returns the render dict with FLAT [N, ...] leaves (N = ray count), or
    None when the requested mode/config needs the composable path (which
    then also provides per-sample outputs). Coverage: all four eval modes,
    S up to MAX_FUSED_SAMPLES, lindisp, uniform + gaussian depth
    populations (gaussian drawn in-kernel on TPU, in XLA under interpret
    mode — no PRNG lowering there).
    """
    from nerf_sampling_tpu.kernels.fused_render import MAX_FUSED_SAMPLES

    p = pipeline
    hier_modes = (EvalMode.FULL_NERF, EvalMode.COMPARE_NERF, EvalMode.NERF_MAX)
    need_hier = mode in hier_modes and p.N_importance > 0
    need_populate = mode in (EvalMode.DEPTH_NET, EvalMode.COMPARE_NERF)

    # eligibility first — a partially-fused COMPARE would waste the kernel
    if (
        mode in (EvalMode.NERF_MAX, EvalMode.COMPARE_NERF)
        and p.N_importance == 0
    ):
        # their max_* diagnostics come from the hier kernel only
        return None
    if need_hier and not (
        4 <= p.N_samples and p.N_samples + p.N_importance <= MAX_FUSED_SAMPLES
    ):
        return None
    if mode == EvalMode.FULL_NERF and p.N_importance == 0 and not (
        1 <= p.N_samples <= MAX_FUSED_SAMPLES
    ):
        return None
    if need_populate and not (
        p.sampling_mode in ("uniform", "gaussian")
        and 1 < p.n_depth_samples <= MAX_FUSED_SAMPLES
    ):
        return None

    interpret = jax.default_backend() == "cpu"
    ro_flat = rays_o.reshape(-1, 3)
    rd_flat = rays_d.reshape(-1, 3)
    nerf_params = params.fine if params.fine is not None else params.coarse
    nerf_cfg = p.fine if params.fine is not None else p.nerf
    # COMPARE is the parity-diagnostic mode (compare-MSE between DepthNet z
    # and the NeRF argmax): run its kernels in fp32 so the diagnostic is in
    # the 3e-4 class instead of carrying bf16 depth/argmax noise. The
    # production modes (DEPTH_NET/FULL_NERF/NERF_MAX) keep bf16 speed.
    kdtype = jnp.float32 if mode == EvalMode.COMPARE_NERF else jnp.bfloat16
    # COMPARE's fp32 diagnostic contract excludes int8 too
    qc, qf = (
        (None, None)
        if mode == EvalMode.COMPARE_NERF
        else _quant_pair(p, params)
    )
    common = dict(
        white_bkgd=p.white_bkgd,
        multires=p.multires,
        multires_views=p.multires_views,
        dtype=kdtype,
        interpret=interpret,
    )

    n = ro_flat.shape[0]

    def map_outputs(maps):
        return {
            "depth_net_rgb_map": maps["rgb_map"],
            "depth_net_disp_map": maps["disp_map"],
            "depth_net_weights": maps["acc_map"],
            "depth_net_z_vals": maps["depth_map"],
            "depth_net_pts": jnp.zeros((n, 0, 3)),
        }

    diag: dict[str, jnp.ndarray] = {}
    if need_hier:
        from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier

        hmaps = fused_render_hier(
            params.coarse,
            p.nerf,
            params.fine,
            p.fine,
            ro_flat,
            rd_flat,
            n_coarse=p.N_samples,
            n_importance=p.N_importance,
            near=p.near,
            far=p.far,
            lindisp=p.lindisp,
            quant=(qc, qf) if qc is not None else None,
            **common,
        )
        if mode == EvalMode.FULL_NERF:
            return map_outputs(hmaps)
        max_z = hmaps["max_z"].reshape(-1, 1)
        max_pts = z_to_points(ro_flat, rd_flat, max_z)
        diag = {
            "max_z_vals": max_z,
            "max_pts": max_pts,
            "max_weights": hmaps["max_w"].reshape(-1, 1),
        }
        if mode == EvalMode.NERF_MAX:
            # render from the argmax sample only (reference :824-829)
            max_rgb = hmaps["max_rgb"]
            return {
                **diag,
                "depth_net_rgb_map": max_rgb,
                "depth_net_disp_map": jnp.zeros_like(max_rgb),
                "depth_net_weights": diag["max_weights"],
                "depth_net_pts": diag["max_pts"],
                "depth_net_z_vals": diag["max_z_vals"],
            }
    elif mode == EvalMode.FULL_NERF:
        from nerf_sampling_tpu.kernels.fused_render import fused_render

        maps = fused_render(
            params.coarse,
            p.nerf,
            ro_flat,
            rd_flat,
            n_samples=p.N_samples,
            near=p.near,
            far=p.far,
            lindisp=p.lindisp,
            quant=qc,
            **common,
        )
        return map_outputs(maps)

    # DEPTH_NET populate-and-shade (also the depth-net half of COMPARE)
    from nerf_sampling_tpu.kernels import fused_depth_net_apply
    from nerf_sampling_tpu.kernels.fused_render import (
        fused_render_around_depth,
        fused_render_gaussian,
        fused_shade,
    )

    depth = fused_depth_net_apply(
        params.depth, p.depth, ro_flat, rd_flat, dtype=kdtype,
        interpret=interpret,
    )
    if mode == EvalMode.COMPARE_NERF:
        # compare mode diagnoses MSE(max_z, per-sample z) — keep the exact
        # [N, S] z values (XLA) and shade them in-kernel
        _, z_vals = sample_points_around_mean(
            ro_flat,
            rd_flat,
            depth,
            n_samples=p.n_depth_samples,
            mode=p.sampling_mode,
            std=p.distance,
            key=key,
        )
        maps = fused_shade(nerf_params, nerf_cfg, ro_flat, rd_flat, z_vals, **common)
        return {
            **diag,
            "depth_net_rgb_map": maps["rgb_map"],
            "depth_net_disp_map": maps["disp_map"],
            "depth_net_weights": maps["acc_map"],
            "depth_net_z_vals": z_vals,
            "depth_net_pts": jnp.zeros((n, 0, 3)),
        }
    if p.sampling_mode == "uniform":
        maps = fused_render_around_depth(
            nerf_params,
            nerf_cfg,
            ro_flat,
            rd_flat,
            depth,
            n_samples=p.n_depth_samples,
            std=p.distance,
            quant=qf,
            **common,
        )
    elif interpret:  # gaussian on CPU: XLA draws (no PRNG lowering), kernel shades
        _, z_vals = sample_points_around_mean(
            ro_flat,
            rd_flat,
            depth,
            n_samples=p.n_depth_samples,
            mode="gaussian",
            std=p.distance,
            key=key,
        )
        maps = fused_shade(nerf_params, nerf_cfg, ro_flat, rd_flat, z_vals,
                           quant=qf, **common)
    else:  # gaussian on TPU: PRNG draw + order-free compositing in-kernel
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        maps = fused_render_gaussian(
            nerf_params,
            nerf_cfg,
            ro_flat,
            rd_flat,
            depth,
            seed,
            n_samples=p.n_depth_samples,
            std=p.distance,
            quant=qf,
            **common,
        )
    return map_outputs(maps)


def render_flat_rays(
    pipeline: Pipeline,
    params: NeRFParams,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    mode: EvalMode = EvalMode.DEPTH_NET,
    chunk: int = 1024 * 32,
    full_outputs: bool = False,
    H: int | None = None,
    W: int | None = None,
    focal=None,
) -> dict[str, jnp.ndarray]:
    """Render a flat [N, 3] ray batch -> dict of flat [N, ...] maps.

    This is the per-shard unit of work: render_image wraps it for a single
    device; parallel.render.render_image_sharded shard_maps it over a mesh
    (rendering is embarrassingly parallel per ray). H/W/focal are only
    needed for NDC reprojection.

    Eligible modes take the fused-kernel fast paths (map-level outputs);
    full_outputs forces the composable path (per-sample pts/weights for
    scene-data export), which tiles rays through a ``lax.map`` — the
    reference's host-side batchify loop (nerf_utils.py:58-85) as one jit
    program: static shapes, no host round-trips, XLA overlaps tile DMA
    with compute.
    """
    fast_ok = (
        not full_outputs
        and pipeline.mlp_impl in PALLAS_IMPLS
        and pipeline.use_viewdirs
        and not pipeline.ndc
        and pipeline.i_embed != -1
    )
    out = _fused_fast_paths(pipeline, params, rays_o, rays_d, key, mode) \
        if fast_ok else None
    if out is not None:
        return out

    rays = make_ray_batch(pipeline, rays_o, rays_d, H=H, W=W, focal=focal)
    n = rays.rays_o.shape[0]
    chunk = min(chunk, n)
    padded = jax.tree.map(lambda x: _pad_to_multiple(x, chunk), rays)
    n_tiles = padded.rays_o.shape[0] // chunk
    tiled = jax.tree.map(lambda x: x.reshape(n_tiles, chunk, *x.shape[1:]), padded)
    keys = jax.random.split(key, n_tiles)

    def tile_fn(args):
        tile_rays, tile_key = args
        return render_rays_eval(pipeline, params, tile_rays, tile_key, mode)

    maps = jax.lax.map(tile_fn, (tiled, keys))
    return {
        name: v.reshape(n_tiles * chunk, *v.shape[2:])[:n]
        for name, v in maps.items()
    }


def render_image(
    pipeline: Pipeline,
    params: NeRFParams,
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    key: jax.Array,
    mode: EvalMode = EvalMode.DEPTH_NET,
    chunk: int = 1024 * 32,
    full_outputs: bool = False,
) -> dict[str, jnp.ndarray]:
    """Render a full image: rays -> render_flat_rays -> [H, W, ...] maps."""
    rays_o, rays_d = get_rays(H, W, K, c2w)
    flat = render_flat_rays(
        pipeline,
        params,
        rays_o.reshape(-1, 3),
        rays_d.reshape(-1, 3),
        key,
        mode=mode,
        chunk=chunk,
        full_outputs=full_outputs,
        H=H,
        W=W,
        focal=K[0][0],
    )
    return {name: v.reshape(H, W, *v.shape[1:]) for name, v in flat.items()}
