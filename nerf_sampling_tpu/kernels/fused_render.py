"""Fully-fused render kernel: rays -> composited rgb/disp/acc/depth maps.

One Pallas program per ray tile performs the ENTIRE deterministic-eval
render (reference render path at perturb=0: stratified z, PE, 8x256 MLP,
alpha compositing — nerf_utils.py:497-611 + sampling_trainer.py:153-230):

    HBM traffic per ray: 32 B in (o|d|pad), 32 B out (rgb|disp|acc|depth)
    — everything else (z values, sample points, embeddings, activations,
    raw outputs, weights) lives and dies in VMEM.

Layout: rows are SAMPLE-MAJOR (row = s * R + r). The MLP sees [SC*R, PAD]
chunk batches (big rows for the MXU); compositing runs on [S, R] planes so
the transmittance scan and weighted reductions are lane-parallel over rays.

v2 (round 2): the MLP streams over sample chunks with a lax.fori_loop
writing into VMEM scratch planes, so activation VMEM is one chunk's worth
regardless of S — this lifts round 1's S<=64 cap (the unrolled-chunk
version OOM'd Mosaic at S=128) to S<=512. New z sources: "lindisp"
(linear-in-disparity z, reference Trainer.py:611), "gaussian" (in-kernel
depth population via the pltpu PRNG, reference utils.py:228-236). Gaussian
populations are composited UNSORTED via the order-free compositor
(kernels.ops.unsorted_weights) — no in-kernel sort needed.

Scope: deterministic-or-gaussian eval (perturb=0, raw_noise_std=0),
use_viewdirs. The hierarchical (N_importance>0) eval path is the separate
fused_hier kernel; stochastic-perturb training keeps the composable
kernel + XLA pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_sampling_tpu.kernels import ops
from nerf_sampling_tpu.kernels.fused_nerf import (
    _flatten_packed,
    _pe_matrices,
    pack_nerf_params,
    raw_base as _raw_base,
)
from nerf_sampling_tpu.models.nerf import NeRFConfig

_RAYS_PER_TILE = 128  # lanes of the [S, R] compositing blocks


def _default_tile(n_samples: int) -> int:
    """Rays per Pallas program: wider tiles amortize fixed per-program cost
    at small S (measured +7%% at S=64). Large S stays at 128: 256-lane
    plane ops at S>=192 compile only at chunk_rows=2048 (Mosaic 500s at
    1024) for a tied-at-best throughput (695 vs 690 corrected krays/s,
    r3 sweep), and the rotation-free stochastic paths prefer 128."""
    return 256 if n_samples <= 64 else _RAYS_PER_TILE


def _default_chunk_rows(tile: int) -> int:
    """MLP rows per streamed chunk. Swept on-chip (scripts/
    sweep_kernel_params.py): 128-lane tiles want 2048-row chunks (S=192:
    600 vs 474 krays/s), 256-lane tiles want 1024 (2048 is slightly worse
    and 512 fails to compile)."""
    return 2048 if tile <= 128 else 1024
_MAX_SAMPLES = 512  # VMEM plane budget (5 fp32 [S, R] planes at S=512 ~ 1.3 MB)
MAX_FUSED_SAMPLES = _MAX_SAMPLES
# Scoped-VMEM cap for the fused kernels (v5e has 128 MB physical VMEM;
# Mosaic's 16 MB default forces serialization of the unrolled MLP chunks).
TPU_VMEM_LIMIT = 100 * 1024 * 1024


def _pack_flat(params, cfg, multires, multires_views, dtype, quant):
    """Flat weight tuple for pallas_call: bf16 layout, or the int8 layout
    when ``quant`` (a kernels.quant.QuantCalib) is given."""
    if quant is not None:
        from nerf_sampling_tpu.kernels.quant import (
            flatten_qpacked,
            qpack_nerf_params,
        )

        return tuple(
            flatten_qpacked(
                qpack_nerf_params(
                    params, cfg, quant, multires, multires_views, dtype,
                    stuff_raw=True,
                )
            )
        )
    return tuple(
        _flatten_packed(
            pack_nerf_params(
                params, cfg, multires, multires_views, dtype, stuff_raw=True
            )
        )
    )


def _mlp_plane_loop(
    cfg, dtype, S, R, z_read, o, d, viewdirs, F, P, w, scratch, heads="full",
    chunk_rows=None, z_step=None, pe_provider_fn=None, raw_base=0,
):
    """Stream the MLP over sample chunks, filling [S, R] scratch planes.

    z_read(s0, SC) must return the [SC, R] z rows starting at s0 (s0 is a
    multiple of SC; SC is static). Writes sigma and sigmoid-rgb planes into
    ``scratch`` = (sigma_s, r_s, g_s, b_s), or only sigma_s with
    ``heads="sigma"`` (skips the views branch — coarse eval passes never
    read rgb).

    z_step: optional static (z0, dz) when the z grid is constant-step
    (z_s = z0 + s*dz, identical for every ray — the linspace eval grid).
    Switches the PE from a per-sample transcendental sin to the rotation
    recurrence (ops.pe_rotation_consts): one sin/cos pair per ray tile,
    then 4 FMAs per sample step.

    pe_provider_fn: optional thunk building an ops.PEOffsetRotation-style
    provider (``.next_chunk(SC)``) — the statically-scheduled rotation
    for host-known offset grids. Python-side schedule state, so it is
    honored only when the chunk loop statically unrolls (n_chunks <= 16);
    the fori path falls back to the transcendental. Mutually exclusive
    with z_step.
    """
    acc = jnp.float32
    if heads == "sigma":
        (sigma_s,) = scratch
    else:
        sigma_s, r_s, g_s, b_s = scratch
    SC = max(1, min(S, (chunk_rows or _default_chunk_rows(R)) // R))
    while S % SC:
        SC //= 2
    n_chunks = S // SC

    # pts = o + z*d makes the whole S input (PE phases + raw passthrough
    # lanes) ONE affine function of z: precompute the per-ray (A, B) pair
    # once per tile (ops.ray_affine_consts) so the chunk loop below is a
    # single full-width FMA + masked sin + trunk matmuls — no per-chunk
    # [*, 8] input build, PE matmul, small-K emb passes, or per-consumer
    # raw-contribution FMAs (raw rows ride the stuffed Ws weights).
    consts = ops.ray_affine_consts(o, d, viewdirs, F, P)
    if z_step is not None:
        z0, dz = z_step
        pe_state0, pe_rot = ops.pe_rotation_consts(consts, P, z0, dz, raw_base)
    else:
        pe_state0 = pe_rot = None
    pe_provider = (
        pe_provider_fn(consts) if pe_provider_fn is not None and n_chunks <= 16
        else None
    )

    def chunk(s0_static_or_dyn, SC, pe_state):
        zc = z_read(s0_static_or_dyn, SC)  # [SC, R]
        if pe_state is not None:
            pe_S, pe_state = ops.pe_rotate_chunk(pe_state, pe_rot, SC, dtype)
        elif pe_provider is not None:
            pe_S = pe_provider.next_chunk(SC)
        else:
            pe_S = None
        raw = ops.mlp_forward_affine(
            cfg, dtype, zc, consts, w, heads=heads, pe_S=pe_S,
            raw_base=raw_base,
        )  # [SC*R, 4]
        sl = pl.ds(s0_static_or_dyn, SC)
        sigma_s[sl] = raw[:, 3].reshape(SC, R)
        if heads != "sigma":
            r_s[sl] = jax.nn.sigmoid(raw[:, 0].reshape(SC, R))
            g_s[sl] = jax.nn.sigmoid(raw[:, 1].reshape(SC, R))
            b_s[sl] = jax.nn.sigmoid(raw[:, 2].reshape(SC, R))
        return pe_state

    # Static unroll when the chunk count is small: a fori_loop serializes
    # against Mosaic's software pipelining and measured ~2x slower at S=64
    # on v5e. The scratch-plane writes (vs round 1's value concatenation)
    # are what keep VMEM flat, so large S still compiles when unrolled is
    # too big and the loop takes over.
    # (A software-pipelined variant that hoisted chunk i+1's fp32 PE sin
    # ahead of chunk i's trunk matmuls was MEASURED perf-neutral on the
    # 800^2 headline bench — 1.591M vs 1.604M rays/s, within tunnel
    # run-to-run variance — because Mosaic schedules on the dependency DAG
    # and already overlaps the VPU sin with the MXU chain. The residual
    # ~1.5x gap to the matmul ceiling is VPU issue-rate bound, not a
    # scheduling artifact, so the simple unroll is kept.)
    if n_chunks <= 16:
        pe_state = pe_state0
        for i in range(n_chunks):
            pe_state = chunk(i * SC, SC, pe_state)
    elif pe_state0 is None:

        def body(i, _):
            chunk(pl.multiple_of(i * SC, SC), SC, None)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
    else:

        def body_rot(i, pe_state):
            return chunk(pl.multiple_of(i * SC, SC), SC, pe_state)

        jax.lax.fori_loop(0, n_chunks, body_rot, pe_state0)


def _kernel(
    cfg,
    dtype,
    n_samples,
    near,
    far,
    white_bkgd,
    z_source,
    lindisp,
    refs,
    scratch,
    chunk_rows=None,
    pe_rotation=None,
    z_offsets=None,
    raw_base=0,
    quant=None,
):
    """z_source: "linspace" | "around_center" (static offsets input) |
    "input" (pre-transposed [S, N] z-values input) | "gaussian"
    (in-kernel PRNG population around the per-ray depth, seed input).

    z_offsets: the around_center UNIT offset grid as a STATIC tuple (the
    z_ref input carries the std-scaled values; the PE reads the scale from
    the rays' lane 7) — enables the offset-scheduled rotation PE without
    putting the sweep distance in the compile key."""
    if z_source in ("around_center", "input", "input_unsorted"):
        rays_ref, z_ref, F_ref, P_ref = refs[0], refs[1], refs[2], refs[3]
        wrefs = refs[4:-1]
    elif z_source == "gaussian":
        rays_ref, seed_ref, F_ref, P_ref = refs[0], refs[1], refs[2], refs[3]
        wrefs = refs[4:-1]
    else:
        rays_ref, F_ref, P_ref = refs[0], refs[1], refs[2]
        wrefs = refs[3:-1]
    out_ref = refs[-1]
    z_s, sigma_s, r_s, g_s, b_s = scratch

    acc = jnp.float32
    R = rays_ref.shape[0]
    S = n_samples
    w = ops.unpack_wrefs(cfg, wrefs, quant=quant)
    F, P = F_ref[:], P_ref[:]

    rays = rays_ref[:]  # [R, 8]: o(3) | d(3) | z_center(1) | std-or-pad(1)
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    d_norm = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))  # [R, 1]
    viewdirs = d / d_norm
    d_norm_row = d_norm[:, 0][None, :]  # [1, R]

    # --- build the z plane [S, R] in scratch
    row_f = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0).astype(acc)
    if z_source == "around_center":
        # DepthNet populate mode: z = clip(center + static offsets, near, far)
        # (reference sample_points_around_mean "uniform",
        # nerf_pytorch/utils.py:231-240; offsets precomputed sorted on host)
        center = rays[:, 6][None, :]  # [1, R]
        z_s[:] = jnp.clip(center + z_ref[:][:, 0][:, None], near, far)
    elif z_source in ("input", "input_unsorted"):
        z_s[:] = z_ref[:]  # [S, R] block of the caller's pre-transposed z
    elif z_source == "gaussian":
        # reference gaussian population (utils.py:228-236): rows 0..S-2 are
        # center + std*randn, row S-1 is the center itself; NO [2,6] clip
        # (only the uniform mode clips). Composited unsorted below — the
        # sort in the reference only orders samples, which the order-free
        # compositor reproduces exactly. std rides the rays' spare lane 7
        # (traced data, not a static) so a distance sweep reuses one
        # compiled kernel per sample count.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        center = rays[:, 6][None, :]  # [1, R]
        stdv = rays[:, 7][None, :]  # [1, R]
        noise = ops.normal_rows((S, R))
        row_i = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
        z_s[:] = center + jnp.where(row_i < S - 1, stdv * noise, 0.0)
    else:
        # stratified linspace at perturb=0 (Trainer.py:604-611); lindisp
        # spaces linearly in inverse depth (1/z)
        t_vals = row_f / max(S - 1, 1)
        if lindisp:
            z_s[:] = 1.0 / (
                (1.0 / near) * (1.0 - t_vals) + (1.0 / far) * t_vals
            )
        else:
            z_s[:] = near * (1.0 - t_vals) + far * t_vals

    # --- MLP over sample chunks -> sigma/rgb planes
    def z_read(s0, SC):
        return z_s[pl.ds(s0, SC)]

    # The plain linspace grid has a compile-time-constant z step shared by
    # every ray: the PE can run as the rotation recurrence (one sin/cos per
    # tile) instead of a transcendental per sample; the uniform populate's
    # host-known offset grid takes the statically-scheduled variant
    # (ops.PEOffsetRotation — <=3 distinct deltas + clip boundary emits).
    # lindisp z is not constant-step; gaussian/input z are per-ray data.
    # Auto (None) enables rotation only for bf16 kernels: the recurrence's
    # fp32 phase drift (~2e-4 at S=64 on the 2^9 frequency) is 40x below
    # bf16 matmul rounding but WOULD show against the 2e-4-class fp32
    # diagnostic tolerances.
    if pe_rotation is None:
        pe_rotation = dtype == jnp.bfloat16
    z_step = None
    pe_provider_fn = None
    if z_source == "linspace" and not lindisp and pe_rotation:
        z_step = (float(near), (far - near) / max(S - 1, 1))
    elif z_source == "around_center" and pe_rotation and z_offsets is not None:
        center_col = rays[:, 6][:, None]  # [R, 1]
        # z_offsets is the UNIT grid (std=1, a function of n_samples only):
        # the schedule is scale-invariant, and the actual std rides the
        # rays' spare lane 7 as traced data (exactly like the gaussian
        # mode), so a distance sweep does NOT enter the static compile key.
        # Read as [R, 1]: a per-ray load, not a [1,1]-to-plane broadcast —
        # Mosaic has no both-axes broadcast, and XLA folds any staged
        # widening back into one (measured: S=2 fails while S=64 compiles).
        scale = rays[:, 7][:, None]  # [R, 1] = std

        def pe_provider_fn(consts):
            return ops.PEOffsetRotation(
                consts, P, center_col, z_offsets, float(near), float(far),
                dtype, raw_base, scale=scale,
            )

    _mlp_plane_loop(
        cfg, dtype, S, R, z_read, o, d, viewdirs, F, P, w,
        (sigma_s, r_s, g_s, b_s), chunk_rows=chunk_rows, z_step=z_step,
        pe_provider_fn=pe_provider_fn, raw_base=raw_base,
    )

    # --- compositing
    z = z_s[:]
    sigma = sigma_s[:]
    rgbs = [r_s[:], g_s[:], b_s[:]]
    if z_source in ("gaussian", "input_unsorted"):
        weights, _, _ = ops.unsorted_weights(z, sigma, d_norm_row)
    else:
        dists = ops.sorted_dists(z, d_norm_row)
        alpha = ops.alpha_from_sigma(sigma, dists)
        weights = alpha * ops.exclusive_cumprod_axis0(1.0 - alpha + 1e-10)

    maps = ops.finalize_maps(weights, z, rgbs, white_bkgd)
    # output rows: r | g | b | disp | acc | depth | pad | pad   -> [8, R]
    out_ref[:] = jnp.concatenate(maps + [jnp.zeros((2, R), acc)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "dtype", "n_samples", "near", "far", "white_bkgd", "tile",
        "interpret", "z_source", "lindisp", "chunk_rows",
        "pe_rotation", "z_offsets", "raw_base", "quant",
    ),
)
def _call(rays, z_arg, F, P, packed_flat, cfg, dtype, n_samples, near, far,
          white_bkgd, tile, interpret, z_source="linspace", lindisp=False,
          chunk_rows=None, pe_rotation=None, z_offsets=None,
          raw_base=0, quant=None):
    def kern(*refs_and_scratch):
        refs, scratch = refs_and_scratch[:-5], refs_and_scratch[-5:]
        _kernel(cfg, dtype, n_samples, near, far, white_bkgd, z_source,
                lindisp, refs, scratch, chunk_rows=chunk_rows,
                pe_rotation=pe_rotation, z_offsets=z_offsets,
                raw_base=raw_base, quant=quant)

    in_arrays = [rays]
    in_specs = [pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if z_source == "around_center":
        in_arrays.append(z_arg)  # actual (std-scaled) offsets [S, 1]
        in_specs.append(
            pl.BlockSpec(z_arg.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    elif z_source in ("input", "input_unsorted"):
        in_arrays.append(z_arg)  # pre-transposed z [S, N]
        in_specs.append(
            pl.BlockSpec(
                (z_arg.shape[0], tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        )
    elif z_source == "gaussian":
        in_arrays.append(z_arg)  # per-call PRNG seed, [1] int32
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    consts = (F, P) + tuple(packed_flat)
    const_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=len(w.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in consts
    ]
    S = n_samples
    return pl.pallas_call(
        kern,
        grid=(rays.shape[0] // tile,),
        in_specs=in_specs + const_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, rays.shape[0]), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, tile), jnp.float32),  # z
            pltpu.VMEM((S, tile), jnp.float32),  # sigma
            pltpu.VMEM((S, tile), jnp.float32),  # r
            pltpu.VMEM((S, tile), jnp.float32),  # g
            pltpu.VMEM((S, tile), jnp.float32),  # b
        ],
        # Mosaic's default scoped-vmem cap is 16 MB and it does NOT reuse
        # buffers across statically-unrolled chunk iterations; v5e has far
        # more physical VMEM, so raise the cap instead of serializing the
        # MLP behind a fori_loop (measured ~2x slower).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TPU_VMEM_LIMIT
        ),
        interpret=interpret,
    )(*in_arrays, *consts)


def _check_samples(S: int) -> None:
    if S < 1 or S > _MAX_SAMPLES:
        raise ValueError(f"n_samples must be in [1, {_MAX_SAMPLES}], got {S}")


def _maps_from_rows(out) -> dict[str, jnp.ndarray]:
    return {
        "rgb_map": out[0:3].T,
        "disp_map": out[3],
        "acc_map": out[4],
        "depth_map": out[5],
    }


def _pack_rays(rays_o, rays_d, tile, center=None, pad_center=4.0, aux7=None):
    n = rays_o.shape[0]
    rays = jnp.zeros((n, 8), jnp.float32)
    rays = rays.at[:, 0:3].set(rays_o.astype(jnp.float32))
    rays = rays.at[:, 3:6].set(rays_d.astype(jnp.float32))
    if center is not None:
        rays = rays.at[:, 6].set(center.reshape(-1).astype(jnp.float32))
    if aux7 is not None:  # spare lane (gaussian std rides here as data)
        rays = rays.at[:, 7].set(jnp.float32(aux7))
    pad = (-n) % tile
    if pad:
        padding = jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(-1.0)
        if center is not None:
            padding = padding.at[:, 6].set(pad_center)
        rays = jnp.concatenate([rays, padding], 0)
    return rays, n


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
    lindisp: bool = False,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    tile: int | None = None,
    interpret: bool = False,
    chunk_rows: int | None = None,
    pe_rotation: bool | None = None,
    quant=None,
) -> dict[str, jnp.ndarray]:
    """Deterministic-eval render of N rays in one fused kernel.

    Returns {"rgb_map" [N,3], "disp_map" [N], "acc_map" [N], "depth_map" [N]}
    matching the composable pipeline (stratified_z_vals(perturb=0) ->
    nerf_apply -> raw2outputs) up to kernel dtype. pe_rotation: None (auto)
    uses the rotation-recurrence PE for bf16 kernels only; True/False force
    it on/off (A/B benchmarking, fp32 drift tests).
    """
    _check_samples(n_samples)
    if tile is None:
        tile = _default_tile(n_samples)
    rays, n = _pack_rays(rays_o, rays_d, tile)
    F, P = _pe_matrices(multires, multires_views)
    packed_flat = _pack_flat(params, cfg, multires, multires_views, dtype,
                             quant)
    out = _call(
        rays, None, F, P, packed_flat, cfg, dtype, n_samples, float(near),
        float(far), bool(white_bkgd), tile, interpret, lindisp=bool(lindisp),
        chunk_rows=chunk_rows, pe_rotation=pe_rotation,
        raw_base=_raw_base(multires, multires_views), quant=quant,
    )[:, :n]
    return _maps_from_rows(out)


def uniform_population_offsets(n_samples: int, std: float):
    """The reference's uniform depth-population offsets, precomputed.

    sample_points_around_mean(mode="uniform") builds
    sorted(cat([mean + linspace(-std, std, n-1), mean])) clipped to [2, 6]
    (nerf_pytorch/utils.py:231-240) — i.e. mean + sorted(grid U {0}).
    """
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
    tile: int | None = None,
    interpret: bool = False,
    pe_rotation: bool | None = None,
    quant=None,
) -> dict[str, jnp.ndarray]:
    """DepthNet populate-and-shade in one fused kernel (uniform mode).

    z values are the reference's uniform population around the predicted
    depth (sample_points_around_mean, clipped to the hardcoded [2, 6]);
    shading matches the composable DEPTH_NET eval path up to kernel dtype.
    The offsets grid is host-known, so bf16 kernels take the statically-
    scheduled rotation PE (ops.PEOffsetRotation); pe_rotation as in
    fused_render.

    depth: [N, 1] or [N] DepthNet predictions.
    """
    _check_samples(n_samples)
    if tile is None:
        tile = _default_tile(n_samples)
    # Actual offsets ride as TRACED input [S, 1] and std rides the rays'
    # spare lane 7; the static z_offsets key is the UNIT grid (a function
    # of n_samples only), so sweeping the distance does not recompile.
    rays, n = _pack_rays(rays_o, rays_d, tile, center=depth, aux7=std)
    offsets = jnp.asarray(uniform_population_offsets(n_samples, std))
    unit = uniform_population_offsets(n_samples, 1.0)
    F, P = _pe_matrices(multires, multires_views)
    packed_flat = _pack_flat(params, cfg, multires, multires_views, dtype,
                             quant)
    out = _call(
        rays, offsets, F, P, packed_flat, cfg, dtype, offsets.shape[0],
        float(clip_near), float(clip_far), bool(white_bkgd), tile, interpret,
        z_source="around_center", pe_rotation=pe_rotation,
        z_offsets=tuple(float(v) for v in unit.reshape(-1)),
        raw_base=_raw_base(multires, multires_views), quant=quant,
    )[:, :n]
    return _maps_from_rows(out)


def fused_render_gaussian(
    params: dict,
    cfg: NeRFConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth: jnp.ndarray,
    seed,
    *,
    n_samples: int = 64,
    std: float = 0.5,
    white_bkgd: bool = True,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    tile: int | None = None,
    interpret: bool = False,
    quant=None,
) -> dict[str, jnp.ndarray]:
    """DepthNet gaussian populate-and-shade, PRNG and all in one kernel.

    The reference draws randn noise, sorts, then composites
    (utils.py:228-236 + raw2outputs); here the draw happens on the TPU core
    (pltpu PRNG, Box-Muller) and compositing is order-free — the sort never
    needs to happen. Distribution-equivalent, not bit-equal, to the XLA
    path (different PRNG streams; gaussian mode is stochastic by design).

    TPU-only: interpret mode has no prng lowering — CPU callers draw in
    XLA and use fused_shade instead (engine handles the dispatch).

    seed: int32 scalar (vary per call for fresh noise).
    """
    if interpret:
        raise NotImplementedError(
            "in-kernel PRNG has no interpret-mode lowering; draw noise in "
            "XLA and call fused_shade"
        )
    _check_samples(n_samples)
    if tile is None:
        tile = _default_tile(n_samples)
    # std rides the rays' spare lane as traced data — a distance sweep
    # reuses one compiled kernel per sample count
    rays, n = _pack_rays(rays_o, rays_d, tile, center=depth, aux7=std)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    F, P = _pe_matrices(multires, multires_views)
    packed_flat = _pack_flat(params, cfg, multires, multires_views, dtype,
                             quant)
    out = _call(
        rays, seed_arr, F, P, packed_flat, cfg, dtype, n_samples,
        2.0, 6.0, bool(white_bkgd), tile, interpret,
        z_source="gaussian",
        raw_base=_raw_base(multires, multires_views), quant=quant,
    )[:, :n]
    return _maps_from_rows(out)


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
    tile: int | None = None,
    interpret: bool = False,
    assume_sorted: bool = True,
    quant=None,
) -> dict[str, jnp.ndarray]:
    """Shade externally-computed z values in the fused kernel.

    Covers any z distribution (gaussian depth population drawn in XLA,
    hierarchical fine samples, ...) — the caller does the sampling, the
    kernel does PE + MLP + compositing. z_vals: [N, S]. With
    ``assume_sorted=False`` the kernel composites via the order-free
    compositor (stable-sort-by-z semantics without sorting), so callers
    need not sort their samples at all.
    """
    n, S = z_vals.shape
    _check_samples(S)
    if tile is None:
        tile = _default_tile(S)
    rays, _ = _pack_rays(rays_o, rays_d, tile)
    z_t = z_vals.astype(jnp.float32).T  # [S, N]: sample-major for the kernel
    pad = (-n) % tile
    if pad:
        z_t = jnp.concatenate(
            [z_t, jnp.broadcast_to(jnp.linspace(2.0, 6.0, S)[:, None], (S, pad))], 1
        )

    F, P = _pe_matrices(multires, multires_views)
    packed_flat = _pack_flat(params, cfg, multires, multires_views, dtype,
                             quant)
    out = _call(
        rays, z_t, F, P, packed_flat, cfg, dtype, S, 2.0, 6.0,
        bool(white_bkgd), tile, interpret,
        z_source="input" if assume_sorted else "input_unsorted",
        raw_base=_raw_base(multires, multires_views), quant=quant,
    )[:, :n]
    return _maps_from_rows(out)
