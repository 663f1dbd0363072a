"""Fully-fused render kernel: rays -> composited rgb/disp/acc/depth maps.

One Pallas program per ray tile performs the ENTIRE deterministic-eval
render (reference render path at perturb=0: stratified z, PE, 8x256 MLP,
alpha compositing — nerf_utils.py:497-611 + sampling_trainer.py:153-230):

    HBM traffic per ray: 32 B in (o|d|pad), 32 B out (rgb|disp|acc|depth)
    — everything else (z values, 64 sample points, embeddings, activations,
    raw outputs, weights) lives and dies in VMEM.

Layout: rows are SAMPLE-MAJOR (row = s * R + r). The MLP sees a
[S*R, PAD] batch (big rows for the MXU); compositing reshapes per-channel
columns to [S, R] so the exclusive transmittance cumprod runs along the
sublane axis as a log-step shift-multiply, and the weighted reductions are
axis-0 sums.

Scope: deterministic eval (perturb=0, raw_noise_std=0), use_viewdirs,
N_importance=0 (the 64-query coarse budget of bench.py). The hierarchical
and stochastic paths keep the composable kernel + XLA pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_sampling_tpu.kernels.fused_nerf import (
    XDIM,
    _flatten_packed,
    _pe_matrices,
    pack_nerf_params,
)
from nerf_sampling_tpu.models.nerf import NeRFConfig

_RAYS_PER_TILE = 128  # lanes of the [S, R] compositing blocks


def _mlp(cfg: NeRFConfig, dtype, X32, F, P, wit):
    """PE + MLP on a [M, XDIM] fp32 input; returns fp32 [M, 4].

    Mirrors kernels.fused_nerf._kernel_body but reads weights from ``wit``
    (an iterator over the packed refs) so the surrounding kernel controls
    ref layout.
    """
    acc = jnp.float32

    def nxt():
        return next(wit)[:]

    S32 = jnp.sin(jnp.dot(X32, F, preferred_element_type=acc) + P)
    X = X32.astype(dtype)
    S = S32.astype(dtype)

    w0x, w0s = nxt(), nxt()
    trunk_w = [None] + [nxt() for _ in range(cfg.D - 1)]
    trunk_b = [nxt() for _ in range(cfg.D)]
    skip = {i: (nxt(), nxt()) for i in range(1, cfg.D) if (i - 1) in cfg.skips}
    views_wx, views_ws, views_wf, views_b = nxt(), nxt(), nxt(), nxt()
    feature_w, feature_b = nxt(), nxt()
    head_rgb4, head_alpha4, head_b4 = nxt(), nxt(), nxt()

    def emb_dot(wx, ws):
        return jnp.dot(X, wx, preferred_element_type=acc) + jnp.dot(
            S, ws, preferred_element_type=acc
        )

    h = None
    for i in range(cfg.D):
        if i == 0:
            z = emb_dot(w0x, w0s)
        elif i in skip:
            z = jnp.dot(h, trunk_w[i], preferred_element_type=acc) + emb_dot(*skip[i])
        else:
            z = jnp.dot(h, trunk_w[i], preferred_element_type=acc)
        h = jax.nn.relu(z + trunk_b[i]).astype(dtype)

    feature = (jnp.dot(h, feature_w, preferred_element_type=acc) + feature_b).astype(
        dtype
    )
    hv = jax.nn.relu(
        jnp.dot(feature, views_wf, preferred_element_type=acc)
        + emb_dot(views_wx, views_ws)
        + views_b
    ).astype(dtype)
    return (
        jnp.dot(hv, head_rgb4, preferred_element_type=acc)
        + jnp.dot(h, head_alpha4, preferred_element_type=acc)
        + head_b4
    )


def _exclusive_cumprod_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive product along axis 0 of [S, R] via log-step shifts.

    Equivalent to cumprod(concat([ones, x], 0))[:-1]; S must be a power of
    two (static). Uses pltpu.roll + iota masking — no gather, VPU only.
    """
    S = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # inclusive scan first
    y = x
    shift = 1
    while shift < S:
        rolled = pltpu.roll(y, shift, 0)
        y = jnp.where(row >= shift, y * rolled, y)
        shift *= 2
    # exclusive: shift down one row, top row = 1
    y = pltpu.roll(y, 1, 0)
    return jnp.where(row == 0, 1.0, y)


def _kernel(cfg, dtype, n_samples, near, far, white_bkgd, z_source, refs):
    """z_source: "linspace" | "around_center" (static offsets input) |
    "input" (pre-transposed [S, N] z-values input)."""
    if z_source == "around_center":
        rays_ref, z_ref, F_ref, P_ref = refs[0], refs[1], refs[2], refs[3]
        wrefs = refs[4:-1]
    elif z_source == "input":
        rays_ref, z_ref, F_ref, P_ref = refs[0], refs[1], refs[2], refs[3]
        wrefs = refs[4:-1]
    else:
        rays_ref, F_ref, P_ref = refs[0], refs[1], refs[2]
        z_ref = None
        wrefs = refs[3:-1]
    out_ref = refs[-1]

    acc = jnp.float32
    R = rays_ref.shape[0]
    S = n_samples

    rays = rays_ref[:]  # [R, 8]: o(3) | d(3) | z_center(1) | pad(1)
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    d_norm = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))  # [R, 1]
    viewdirs = d / d_norm

    if z_source == "around_center":
        # DepthNet populate mode: z = clip(center + static offsets, near, far)
        # (reference sample_points_around_mean "uniform",
        # nerf_pytorch/utils.py:231-240; offsets precomputed sorted on host)
        center = rays[:, 6][None, :]  # [1, R]
        z = jnp.clip(center + z_ref[:][:, 0][:, None], near, far)  # [S, R]
    elif z_source == "input":
        z = z_ref[:]  # [S, R] block of the caller's pre-transposed z values
    else:
        # z values: stratified linspace (eval: perturb=0), Trainer.py:604-610
        srow = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0).astype(acc)
        t_vals = srow / (S - 1)
        z = near * (1.0 - t_vals) + far * t_vals  # [S, R] (same per ray)

    # The MLP runs over sample-chunks (SC*R rows each) so its activations
    # never hold all S samples at once: the [S*R, 256] versions blew the
    # 16 MB VMEM budget at R=128. Only the tiny [S, R] channel planes
    # survive the loop.
    SC = max(1, min(S, 2048 // R))  # rows per MLP call = SC*R <= 2048
    sigma_parts, rgb_parts = [], [[], [], []]
    for s0 in range(0, S, SC):
        zc = z[s0 : s0 + SC]  # [SC, R]
        o_b = jnp.broadcast_to(o[None], (SC, R, 3))
        d_b = jnp.broadcast_to(d[None], (SC, R, 3))
        v_b = jnp.broadcast_to(viewdirs[None], (SC, R, 3))
        pts = o_b + d_b * zc[..., None]
        X32 = jnp.concatenate(
            [pts, v_b, jnp.zeros((SC, R, XDIM - 6), acc)], axis=-1
        ).reshape(SC * R, XDIM)
        raw = _mlp(cfg, dtype, X32, F_ref[:], P_ref[:], iter(wrefs))  # [SC*R, 4]
        sigma_parts.append(raw[:, 3].reshape(SC, R))
        for c in range(3):
            rgb_parts[c].append(jax.nn.sigmoid(raw[:, c].reshape(SC, R)))

    sigma = jnp.concatenate(sigma_parts, axis=0)  # [S, R]

    # dists: z[s+1]-z[s], 1e10 tail, scaled by |d| (sampling_trainer.py:177-182)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
    if S > 1:
        dz = pltpu.roll(z, S - 1, 0) - z  # z[s+1]-z[s]; only rows < S-1 used
    else:
        dz = z  # unused: the S==1 row takes the 1e10 tail below
    dists = jnp.where(row == S - 1, 1e10, dz) * d_norm[:, 0][None, :]

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)  # [S, R]
    trans = _exclusive_cumprod_axis0(1.0 - alpha + 1e-10)
    weights = alpha * trans

    # Mosaic rejects sublane-axis (axis 0) reductions outright; express
    # sum-over-samples as a ones-row matmul on the MXU instead.
    ones_row = jnp.ones((1, S), acc)

    def reduce0(x):  # [S, R] -> [1, R]
        return jnp.dot(ones_row, x, preferred_element_type=acc)

    acc_map = reduce0(weights)  # [1, R]
    depth_map = reduce0(weights * z)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / (acc_map + 1e-10))
    chans = []
    for c in range(3):
        ch = jnp.concatenate(rgb_parts[c], axis=0)  # [S, R]
        ch_map = reduce0(weights * ch)  # [1, R]
        if white_bkgd:
            ch_map = ch_map + (1.0 - acc_map)
        chans.append(ch_map)

    # output rows: r | g | b | disp | acc | depth | pad | pad   -> [8, R]
    out_ref[:] = jnp.concatenate(
        chans + [disp_map, acc_map, depth_map, jnp.zeros((2, R), acc)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "dtype", "n_samples", "near", "far", "white_bkgd", "tile",
        "interpret", "z_source",
    ),
)
def _call(rays, z_arg, F, P, packed_flat, cfg, dtype, n_samples, near, far,
          white_bkgd, tile, interpret, z_source="linspace"):
    def kern(*refs):
        _kernel(cfg, dtype, n_samples, near, far, white_bkgd, z_source, refs)

    in_arrays = [rays]
    in_specs = [pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if z_source == "around_center":
        in_arrays.append(z_arg)  # static offsets [S, 1]
        in_specs.append(
            pl.BlockSpec(z_arg.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    elif z_source == "input":
        in_arrays.append(z_arg)  # pre-transposed z [S, N]
        in_specs.append(
            pl.BlockSpec(
                (z_arg.shape[0], tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        )
    consts = (F, P) + tuple(packed_flat)
    const_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=len(w.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in consts
    ]
    return pl.pallas_call(
        kern,
        grid=(rays.shape[0] // tile,),
        in_specs=in_specs + const_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, rays.shape[0]), jnp.float32),
        interpret=interpret,
    )(rays, *in_arrays[1:], *consts)


def fused_render(
    params: dict,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    tile: int = _RAYS_PER_TILE,
    interpret: bool = False,
) -> dict[str, jnp.ndarray]:
    """Deterministic-eval render of N rays in one fused kernel.

    Returns {"rgb_map" [N,3], "disp_map" [N], "acc_map" [N], "depth_map" [N]}
    matching the composable pipeline (stratified_z_vals(perturb=0) ->
    nerf_apply -> raw2outputs) up to kernel dtype.
    """
    if n_samples & (n_samples - 1):
        raise ValueError("n_samples must be a power of two (cumprod scan)")
    n = rays_o.shape[0]
    rays = jnp.zeros((n, 8), jnp.float32)
    rays = rays.at[:, 0:3].set(rays_o.astype(jnp.float32))
    rays = rays.at[:, 3:6].set(rays_d.astype(jnp.float32))
    pad = (-n) % tile
    if pad:
        padding = jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(-1.0)
        rays = jnp.concatenate([rays, padding], 0)

    F, P = _pe_matrices(multires, multires_views)
    packed_flat = tuple(
        _flatten_packed(pack_nerf_params(params, cfg, multires, multires_views, dtype))
    )
    out = _call(
        rays, None, F, P, packed_flat, cfg, dtype, n_samples, float(near),
        float(far), bool(white_bkgd), tile, interpret,
    )[:, :n]
    return {
        "rgb_map": out[0:3].T,
        "disp_map": out[3],
        "acc_map": out[4],
        "depth_map": out[5],
    }


def uniform_population_offsets(n_samples: int, std: float):
    """The reference's uniform depth-population offsets, precomputed.

    sample_points_around_mean(mode="uniform") builds
    sorted(cat([mean + linspace(-std, std, n-1), mean])) clipped to [2, 6]
    (nerf_pytorch/utils.py:231-240) — i.e. mean + sorted(grid U {0}).
    """
    import numpy as np

    if n_samples < 2:
        return np.zeros((1, 1), np.float32)
    grid = np.linspace(-std, std, n_samples - 1)
    offs = np.sort(np.concatenate([grid, [0.0]]))
    return offs.astype(np.float32).reshape(n_samples, 1)


def fused_render_around_depth(
    params: dict,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth: jnp.ndarray,
    *,
    n_samples: int = 64,
    std: float = 0.5,
    clip_near: float = 2.0,
    clip_far: float = 6.0,
    white_bkgd: bool = True,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    tile: int = _RAYS_PER_TILE,
    interpret: bool = False,
) -> dict[str, jnp.ndarray]:
    """DepthNet populate-and-shade in one fused kernel.

    z values are the reference's uniform population around the predicted
    depth (sample_points_around_mean, clipped to the hardcoded [2, 6]);
    shading matches the composable DEPTH_NET eval path up to kernel dtype.

    depth: [N, 1] or [N] DepthNet predictions.
    """
    if n_samples & (n_samples - 1):
        raise ValueError("n_samples must be a power of two (cumprod scan)")
    n = rays_o.shape[0]
    rays = jnp.zeros((n, 8), jnp.float32)
    rays = rays.at[:, 0:3].set(rays_o.astype(jnp.float32))
    rays = rays.at[:, 3:6].set(rays_d.astype(jnp.float32))
    rays = rays.at[:, 6].set(depth.reshape(-1).astype(jnp.float32))
    pad = (-n) % tile
    if pad:
        padding = (
            jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(-1.0).at[:, 6].set(4.0)
        )
        rays = jnp.concatenate([rays, padding], 0)

    offsets = uniform_population_offsets(n_samples, std)  # host constant
    F, P = _pe_matrices(multires, multires_views)
    packed_flat = tuple(
        _flatten_packed(pack_nerf_params(params, cfg, multires, multires_views, dtype))
    )
    out = _call(
        rays, offsets, F, P, packed_flat, cfg, dtype, n_samples,
        float(clip_near), float(clip_far), bool(white_bkgd), tile, interpret,
        z_source="around_center",
    )[:, :n]
    return {
        "rgb_map": out[0:3].T,
        "disp_map": out[3],
        "acc_map": out[4],
        "depth_map": out[5],
    }


def fused_shade(
    params: dict,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    *,
    white_bkgd: bool = True,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    tile: int = _RAYS_PER_TILE,
    interpret: bool = False,
) -> dict[str, jnp.ndarray]:
    """Shade externally-computed z values in the fused kernel.

    Covers any z distribution (gaussian depth population, hierarchical fine
    samples, ...) — the caller does the sampling in XLA, the kernel does
    PE + MLP + compositing. z_vals: [N, S], S a power of two.
    """
    n, S = z_vals.shape
    if S & (S - 1):
        raise ValueError("S must be a power of two (cumprod scan)")
    rays = jnp.zeros((n, 8), jnp.float32)
    rays = rays.at[:, 0:3].set(rays_o.astype(jnp.float32))
    rays = rays.at[:, 3:6].set(rays_d.astype(jnp.float32))
    z_t = z_vals.astype(jnp.float32).T  # [S, N]: sample-major for the kernel
    pad = (-n) % tile
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(-1.0)], 0
        )
        z_t = jnp.concatenate(
            [z_t, jnp.broadcast_to(jnp.linspace(2.0, 6.0, S)[:, None], (S, pad))], 1
        )

    F, P = _pe_matrices(multires, multires_views)
    packed_flat = tuple(
        _flatten_packed(pack_nerf_params(params, cfg, multires, multires_views, dtype))
    )
    out = _call(
        rays, z_t, F, P, packed_flat, cfg, dtype, S, 2.0, 6.0,
        bool(white_bkgd), tile, interpret, z_source="input",
    )[:, :n]
    return {
        "rgb_map": out[0:3].T,
        "disp_map": out[3],
        "acc_map": out[4],
        "depth_map": out[5],
    }
