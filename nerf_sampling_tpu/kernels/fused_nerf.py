"""Fused PE + NeRF-MLP Pallas kernel: raw points/dirs -> raw (rgb, sigma).

Replaces the reference's run_network + NeRF.forward hot path
(Trainer.py:789-806, run_nerf_helpers.py:109-134) for use_viewdirs models,
including the positional encoding (run_nerf_helpers.py:15-63).

Why PE lives in the kernel: at 41M points per 800^2/64-sample image, the
XLA-materialized [N, 63] embedding costs ~10 GB of HBM traffic per
intermediate and dominated the render once the MLP went bf16. In-kernel the
encoding is one tiny fp32 matmul + sin:

    S = sin(X @ F + P)          X: [T, 8] raw (px py pz dx dy dz 0 0)
                                F: [8, 128] frequency selector
                                P: phase (0 = sin, pi/2 = cos  — cos(z) =
                                   sin(z + pi/2)), zero rows for pad cols
    emb-consuming layers:  cat-weights split into  X @ Wx  +  S @ Ws
    (Wx carries the reference's identity-passthrough rows, Ws the sin/cos
    rows, both row-permuted to the kernel's S layout at pack time).

The PE matmul and sin run in fp32 (bf16 would destroy high-frequency phase:
sin(512 * x) needs more than 8 mantissa bits); activations and trunk matmuls
are bf16 with fp32 accumulation (MXU requirement). Concats are rewritten as
matmul sums; the two output heads collapse into one 4-column dot-sum (a
trailing lane concat halved throughput). Weights stay VMEM-resident across
grid programs; activations never touch HBM.

No VJP — rendering/eval only; training uses the differentiable XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_sampling_tpu.models.nerf import NeRFConfig

PAD = 128  # lane width of the sin-feature buffer
XDIM = 8  # raw-input buffer width (3 pts + 3 dirs + 2 pad)
_TILE = 2048


def _pe_matrices(multires: int, multires_views: int):
    """(F [XDIM, PAD], P [PAD]) building S = sin(X @ F + P).

    S column layout (matches the reference's per-frequency sin/cos blocks,
    run_nerf_helpers.py:36-39):
      cols [0, 6*M):            pts  freq f: sin(x*2^f) dims 0..2, then cos
      cols [6*M, 6*M + 6*Mv):   dirs likewise
      cols [RAW, RAW+6):        identity passthrough rows (RAW = 6*(M+Mv)):
                                the affine ray kernels carry the RAW inputs
                                (pts, viewdirs) in these otherwise-dead
                                lanes so the reference's identity rows ride
                                the S matmul's zero-padded weight rows for
                                free (see pack_nerf_params stuff_raw). The
                                point kernels' weights keep zero rows there,
                                so sin(x) landing in those lanes is inert.
      remaining cols:           zero (F=0, P=0 -> sin(0)=0)

    Returned as HOST numpy arrays on purpose: when this runs inside an
    outer jit trace, a ``jnp.asarray`` here would eagerly commit a device
    buffer that lowering must read back — a read that can fail on a wedged
    remote backend (the BENCH_r01 FAILED_PRECONDITION). numpy constants
    embed into the HLO without touching the device.
    """
    F = np.zeros((XDIM, PAD), np.float32)
    P = np.zeros((PAD,), np.float32)
    col = 0
    for base, m in ((0, multires), (3, multires_views)):
        for f in range(m):
            for s, phase in ((0, 0.0), (1, math.pi / 2)):
                for dim in range(3):
                    F[base + dim, col] = 2.0**f
                    P[col] = phase
                    col += 1
    if col + 6 <= PAD:  # raw passthrough lanes: X_o@F -> [o | vd], X_d@F -> [d | 0]
        for dim in range(6):
            F[dim, col + dim] = 1.0
    # else: sin/cos columns fill (nearly) all of PAD — no room for the raw
    # lanes. Point kernels (stuff_raw=False) don't use them; ray kernels
    # reject the config in pack_nerf_params.
    return F, P


def raw_base(multires: int, multires_views: int) -> int:
    """First raw-passthrough lane in the S layout (see _pe_matrices)."""
    return 6 * (multires + multires_views)


def _split_emb_rows(w_emb, multires, multires_views, dtype, raw_lane_base=None):
    """[Cp+Cv, out] emb-consuming weight -> (Wx [XDIM, out], Ws [PAD, out]).

    Row permutation: reference emb rows are [pts raw(3), pts sin/cos(6M),
    dirs raw(3), dirs sin/cos(6Mv)]; the kernel's X carries the raw rows and
    S the sin/cos rows in the same inner order.

    raw_lane_base (the S layout's passthrough base, raw_base()) makes the
    split additionally write the raw rows into Ws at those lanes: the
    affine ray kernels then consume ONE matmul per layer — no per-chunk X
    build or separate raw-contribution FMA — because S itself carries
    [pts | viewdirs] there. Point kernels (which put sin(x) in those
    lanes) must pass None.
    """
    out = w_emb.shape[1]
    sp, sv = 6 * multires, 6 * multires_views
    rb, stuff_raw = raw_lane_base, raw_lane_base is not None
    wx = jnp.zeros((XDIM, out), dtype)
    wx = wx.at[0:3].set(w_emb[0:3].astype(dtype))
    ws = jnp.zeros((PAD, out), dtype)
    ws = ws.at[0:sp].set(w_emb[3 : 3 + sp].astype(dtype))
    if stuff_raw:
        ws = ws.at[rb : rb + 3].set(w_emb[0:3].astype(dtype))
    if w_emb.shape[0] > 3 + sp:  # has dirs rows
        wx = wx.at[3:6].set(w_emb[3 + sp : 6 + sp].astype(dtype))
        ws = ws.at[sp : sp + sv].set(w_emb[6 + sp :].astype(dtype))
        if stuff_raw:
            ws = ws.at[rb + 3 : rb + 6].set(w_emb[3 + sp : 6 + sp].astype(dtype))
    return wx, ws


def pack_nerf_params(
    params: dict,
    cfg: NeRFConfig,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    stuff_raw: bool = False,
) -> dict:
    """Repack a NeRF param pytree for the fused kernel (see module doc).

    stuff_raw=True writes the raw identity rows into the Ws matrices'
    passthrough lanes (affine ray kernels: fused_render / fused_hier) —
    the Wx halves are then inert. Point kernels keep False.
    """
    if not cfg.use_viewdirs:
        raise ValueError("fused kernel requires use_viewdirs=True")
    Cp, Cv, W = cfg.input_ch, cfg.input_ch_views, cfg.W
    if Cp != 3 + 6 * multires or Cv != 3 + 6 * multires_views:
        raise ValueError("input_ch inconsistent with multires settings")
    rb = raw_base(multires, multires_views)
    if rb > PAD:
        raise ValueError("sin-feature width exceeds PAD")
    if stuff_raw and rb + 6 > PAD:
        # Only the affine ray kernels need the 6 raw passthrough lanes;
        # point kernels (stuff_raw=False) work up to the full PAD width.
        raise ValueError(
            "no room for the raw passthrough lanes at this multires "
            "(6*(multires+multires_views) must be <= PAD-6 for the ray "
            "kernels); use the point-kernel or XLA path"
        )
    rb_or_none = rb if stuff_raw else None

    def cast(x):
        return x.astype(dtype)

    def split_pts_only(w):  # weight consuming only the pts embedding [Cp, out]
        return _split_emb_rows(w, multires, 0, dtype, raw_lane_base=rb_or_none)

    packed: dict = {"trunk_w": [], "trunk_b": [], "skip_wx": {}, "skip_ws": {}}
    for i, layer in enumerate(params["pts_linears"]):
        w, b = layer["weight"], layer["bias"]
        if i == 0:
            wx, ws = split_pts_only(w)
            packed["w0x"], packed["w0s"] = wx, ws
            packed["trunk_w"].append(None)
        elif (i - 1) in cfg.skips:
            # reference concat order: cat([input_pts, h]) (helpers.py:118)
            wx, ws = split_pts_only(w[:Cp])
            packed["skip_wx"][i], packed["skip_ws"][i] = wx, ws
            packed["trunk_w"].append(cast(w[Cp:]))
        else:
            packed["trunk_w"].append(cast(w))
        packed["trunk_b"].append(b.astype(jnp.float32))

    packed["feature_w"] = cast(params["feature_linear"]["weight"])
    packed["feature_b"] = params["feature_linear"]["bias"].astype(jnp.float32)
    # views head: cat([feature, views_emb]) @ W — views rows need the DIRS
    # slots: prepend Cp zero rows so _split_emb_rows sees [pts | dirs] layout.
    vw = params["views_linears"][0]["weight"]
    vw_emb = jnp.concatenate(
        [jnp.zeros((Cp, vw.shape[1]), vw.dtype), vw[W:]], axis=0
    )
    packed["views_wx"], packed["views_ws"] = _split_emb_rows(
        vw_emb, multires, multires_views, dtype, raw_lane_base=rb_or_none
    )
    packed["views_wf"] = cast(vw[:W])
    packed["views_b"] = params["views_linears"][0]["bias"].astype(jnp.float32)
    # combined 4-col head: cols 0-2 rgb (from hv), col 3 alpha (from h)
    rgb_w, rgb_b = params["rgb_linear"]["weight"], params["rgb_linear"]["bias"]
    alpha_w, alpha_b = params["alpha_linear"]["weight"], params["alpha_linear"]["bias"]
    packed["head_rgb4"] = jnp.zeros((W // 2, 4), dtype).at[:, :3].set(cast(rgb_w))
    packed["head_alpha4"] = jnp.zeros((W, 4), dtype).at[:, 3:].set(cast(alpha_w))
    packed["head_b4"] = (
        jnp.zeros((4,), jnp.float32)
        .at[:3]
        .set(rgb_b.astype(jnp.float32))
        .at[3]
        .set(alpha_b.astype(jnp.float32)[0])
    )
    return packed


def _flatten_packed(packed: dict) -> list:
    flat = [packed["w0x"], packed["w0s"]]
    flat += [w for w in packed["trunk_w"] if w is not None]
    flat += list(packed["trunk_b"])
    for i in sorted(packed["skip_wx"]):
        flat += [packed["skip_wx"][i], packed["skip_ws"][i]]
    flat += [
        packed["views_wx"],
        packed["views_ws"],
        packed["views_wf"],
        packed["views_b"],
        packed["feature_w"],
        packed["feature_b"],
        packed["head_rgb4"],
        packed["head_alpha4"],
        packed["head_b4"],
    ]
    return flat


def _kernel_body(cfg: NeRFConfig, dtype, refs):
    x_ref, F_ref, P_ref, out_ref = refs[0], refs[1], refs[2], refs[-1]
    it = iter(refs[3:-1])

    def nxt():
        return next(it)[:]

    acc = jnp.float32
    X32 = x_ref[:]  # [T, XDIM] fp32 raw inputs
    # fp32 PE: high frequencies need full mantissa for the phase
    S32 = jnp.sin(
        jnp.dot(X32, F_ref[:], preferred_element_type=acc) + P_ref[:]
    )
    X = X32.astype(dtype)
    S = S32.astype(dtype)

    w0x, w0s = nxt(), nxt()
    trunk_w = [None] + [nxt() for _ in range(cfg.D - 1)]
    trunk_b = [nxt() for _ in range(cfg.D)]
    skip = {
        i: (nxt(), nxt())
        for i in range(1, cfg.D)
        if (i - 1) in cfg.skips
    }
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
            z = jnp.dot(h, trunk_w[i], preferred_element_type=acc) + emb_dot(
                *skip[i]
            )
        else:
            z = jnp.dot(h, trunk_w[i], preferred_element_type=acc)
        h = jax.nn.relu(z + trunk_b[i]).astype(dtype)

    feature = (
        jnp.dot(h, feature_w, preferred_element_type=acc) + feature_b
    ).astype(dtype)
    hv = jax.nn.relu(
        jnp.dot(feature, views_wf, preferred_element_type=acc)
        + emb_dot(views_wx, views_ws)
        + views_b
    ).astype(dtype)
    out_ref[:] = (
        jnp.dot(hv, head_rgb4, preferred_element_type=acc)
        + jnp.dot(h, head_alpha4, preferred_element_type=acc)
        + head_b4
    )


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "tile", "interpret"))
def _fused_call(x, F, P, packed_flat, cfg, dtype, tile, interpret):
    def kern(*refs):
        _kernel_body(cfg, dtype, refs)

    const_specs = [
        pl.BlockSpec(
            w.shape,
            lambda i, nd=len(w.shape): (0,) * nd,
            memory_space=pltpu.VMEM,
        )
        for w in (F, P, *packed_flat)
    ]
    return pl.pallas_call(
        kern,
        grid=(x.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, XDIM), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + const_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 4), jnp.float32),
        interpret=interpret,
    )(x, F, P, *packed_flat)


def fused_nerf_apply(
    params: dict,
    cfg: NeRFConfig,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    multires: int = 10,
    multires_views: int = 4,
    *,
    dtype=jnp.bfloat16,
    tile: int = _TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Evaluate PE + NeRF MLP on raw inputs with the fused kernel.

    Args:
        params: NeRF param pytree (models.nerf layout).
        pts: [..., 3] raw sample points.
        viewdirs: [..., 3] view directions (broadcastable to pts' batch
            shape, e.g. per-ray dirs vs per-sample points).
        multires / multires_views: PE frequency counts (must match
            cfg.input_ch / input_ch_views).

    Returns [..., 4] fp32 raw output matching
    nerf_apply(params, cfg, cat(PE(pts), PE(dirs))) up to the compute dtype
    (~0.2% mean relative error for bf16; PSNR parity < 0.01 dB measured).
    """
    batch_shape = pts.shape[:-1]
    pts_flat = pts.reshape(-1, 3).astype(jnp.float32)
    dirs_flat = jnp.broadcast_to(viewdirs, batch_shape + (3,)).reshape(-1, 3)
    n = pts_flat.shape[0]

    x = jnp.zeros((n, XDIM), jnp.float32)
    x = x.at[:, 0:3].set(pts_flat)
    x = x.at[:, 3:6].set(dirs_flat.astype(jnp.float32))

    tile = min(tile, max(8, n))
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, XDIM), x.dtype)], 0)

    F, P = _pe_matrices(multires, multires_views)
    packed = pack_nerf_params(params, cfg, multires, multires_views, dtype)
    packed_flat = tuple(_flatten_packed(packed))
    out = _fused_call(x, F, P, packed_flat, cfg, dtype, tile, interpret)
    return out[:n].reshape(*batch_shape, 4)
