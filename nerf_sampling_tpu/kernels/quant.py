"""W8A8 int8 quantization for the fused NeRF kernels' h-chain matmuls.

The fused kernels' FLOPs live in the matmuls whose LHS is the hidden
activation: trunk layers 1..D-1, feature, and the views matmul (~87% of
the per-point MACs at D=8/W=256). This module quantizes exactly those to
int8 weights x int8 activations with int32 MXU accumulation; everything
else (the fp32 PE, the S-consuming bf16 matmuls, the 4-col heads, the
compositing) is unchanged, so the quantized kernel plugs into the same
_mlp_plane_loop streaming structure.

Measured basis (scripts/probe_int8.py on the production trunk shape):
the v5e datasheet's 2x int8 MXU ratio is NOT reachable through Mosaic —
a raw int8 chain issues 1.26x bf16, and per-channel epilogue rows eat
that to ~1.05-1.09x. The shape that keeps 1.15x is the one implemented
here:

  - per-OUTPUT-channel weight scales, folded into the NEXT layer's
    weight rows before quantizing them (so no per-channel rescale of the
    activation is ever needed);
  - bias added in the int32 accumulator domain (the one per-channel row
    op that survives — measured ~4% of the chain);
  - relu + requantization to int8 via a per-layer SCALAR multiplier and
    shifts, entirely in the integer domain:
        t  = (a + r_p) >> p          (pre-shift so t*m fits int32)
        h' = min((t*m + r_q) >> q, 127)
    with (p, q, m) derived from a host-side calibration pass.

Scale plumbing: activation h_i carries PER-CHANNEL effective scales
u_i[j] (real value ~ h_q[j] * u_i[j]); consumers absorb u_i into their
weight rows at pack time, so the kernel never sees it. At the three fp32
merge points (layer 0's bf16 output, the skip layer's S-concat, the
views layer's S-concat) the requant runs in fp32 with a per-tensor
scalar scale instead — one layer each, measured in the probe as noise.

Calibration (host-side, numpy): a full-precision forward over sample
points from caller-provided rays records per-channel activation amaxes;
the requant constants derived from them are STATIC (part of the jit
compile key) and tied to the calibrated checkpoint — requantizing a
different checkpoint under a stale QuantCalib saturates gracefully but
should be avoided. Weight quantization itself happens at trace time from
the live params, so the int8 tensors always match the params passed in.

Parity anchor: the quantized kernel approximates the same reference
compute (run_nerf_helpers.py:109-134 NeRF.forward) as the bf16 kernels;
the acceptance gate is the measured PSNR delta vs bf16 on trained
fields (RESULTS.md round 4), not elementwise tolerance.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.models.nerf import NeRFConfig

_I8MAX = 127.0


@dataclasses.dataclass(frozen=True)
class QuantCalib:
    """Static per-layer requant constants (hashable — jit compile key).

    steps[i-1] describes trunk layer i (i = 1..D-1):
      ("int", p, q, m)   — integer-domain requant (non-skip layers)
      ("skip", inv_sh)   — fp32 merge + per-tensor requant (skip layers)
    feat: ("int", p, q, m) for the feature layer (signed clip).
    sh0: per-tensor scale of h_0 (layer 0's fp32 relu output).
    """

    sh0: float
    steps: tuple
    feat: tuple


def _decompose(S: float) -> tuple[int, int, int]:
    """(p, q, m) with (t*m)>>q ~ a/S for t = a>>p, t <= 2^15, m < 2^15."""
    S = float(max(S, 1e-20))
    amax_int = _I8MAX * S
    p = max(0, int(math.ceil(math.log2(max(amax_int, 1.0)))) - 15)
    ratio = (2.0**p) / S
    q = 14 - int(math.floor(math.log2(ratio)))
    q = max(0, min(q, 30))
    m = int(round(ratio * (2.0**q)))
    m = min(max(m, 1), (1 << 15) - 1)
    return p, q, m


def _np_packed(params: dict, cfg: NeRFConfig, multires: int,
               multires_views: int) -> dict:
    """Host numpy copy of the fp32 stuffed-ray packed params."""
    from nerf_sampling_tpu.kernels.fused_nerf import pack_nerf_params

    packed = pack_nerf_params(
        params, cfg, multires, multires_views, jnp.float32, stuff_raw=True
    )
    return jax.tree.map(lambda x: None if x is None else np.asarray(x), packed)


def _np_s_matrix(pts: np.ndarray, dirs: np.ndarray, multires: int,
                 multires_views: int) -> np.ndarray:
    """The kernel's S input for raw points/dirs (host mirror of
    ops.pe_sin_chunk at stuff_raw layout): sin lanes emit sin(X@F+P),
    raw passthrough lanes emit the raw [pts | viewdirs] values."""
    from nerf_sampling_tpu.kernels.fused_nerf import (
        XDIM,
        _pe_matrices,
        raw_base,
    )

    F, P = _pe_matrices(multires, multires_views)
    n = pts.shape[0]
    X = np.zeros((n, XDIM), np.float32)
    X[:, 0:3] = pts
    X[:, 3:6] = dirs
    arg = X @ F + P
    S = np.sin(arg)
    rb = raw_base(multires, multires_views)
    S[:, rb : rb + 6] = arg[:, rb : rb + 6]
    return S


def calibrate_nerf_quant(
    params: dict,
    cfg: NeRFConfig,
    rays_o,
    rays_d,
    *,
    near: float = 2.0,
    far: float = 6.0,
    multires: int = 10,
    multires_views: int = 4,
    n_rays: int = 512,
    n_z: int = 17,
    margin: float = 1.0,
) -> QuantCalib:
    """Host-side calibration: full-precision forward over sample points
    from the given rays, recording the activation ranges the integer
    requant constants need.

    rays_o/rays_d: [N, 3] representative rays (a train-batch slice or the
    render view's rays). Points are the linspace z grid over [near, far]
    — the same support the eval/populate kernels query. margin scales
    every calibrated amax (headroom against unseen activations; the int8
    clip saturates gracefully either way).
    """
    if not cfg.use_viewdirs:
        raise ValueError("int8 quantization targets use_viewdirs kernels")
    p = _np_packed(params, cfg, multires, multires_views)
    o = np.asarray(jax.device_get(rays_o), np.float32).reshape(-1, 3)
    d = np.asarray(jax.device_get(rays_d), np.float32).reshape(-1, 3)
    idx = np.linspace(0, o.shape[0] - 1, min(n_rays, o.shape[0])).astype(int)
    o, d = o[idx], d[idx]
    vd = d / np.linalg.norm(d, axis=1, keepdims=True)
    z = np.linspace(near, far, n_z, dtype=np.float32)
    pts = (o[:, None] + z[None, :, None] * d[:, None]).reshape(-1, 3)
    dirs = np.broadcast_to(vd[:, None], (vd.shape[0], n_z, 3)).reshape(-1, 3)
    S = _np_s_matrix(pts, dirs, multires, multires_views)

    D = cfg.D
    skips = set(cfg.skips)
    h = np.maximum(S @ p["w0s"] + p["trunk_b"][0], 0.0)
    hmax = [np.abs(h).max(axis=0)]  # per-channel amax of h_0..h_{D-1}
    for i in range(1, D):
        zi = h @ p["trunk_w"][i]
        if (i - 1) in skips:
            zi = zi + S @ p["skip_ws"][i]
        h = np.maximum(zi + p["trunk_b"][i], 0.0)
        hmax.append(np.abs(h).max(axis=0))
    feat = h @ p["feature_w"] + p["feature_b"]
    fmax = np.abs(feat).max(axis=0)

    # walk the scale chain exactly as qpack_nerf_params will, deriving the
    # static requant constants from the calibrated (margin-scaled) amaxes
    hmax = [m_ * margin for m_ in hmax]
    fmax = fmax * margin
    sh0 = float(max(hmax[0].max() / _I8MAX, 1e-12))
    u = np.full(cfg.W, sh0, np.float32)
    steps = []
    for i in range(1, D):
        if (i - 1) in skips:
            sh = float(max(hmax[i].max() / _I8MAX, 1e-12))
            steps.append(("skip", 1.0 / sh))
            u = np.full(cfg.W, sh, np.float32)
        else:
            wfold = p["trunk_w"][i] * u[:, None]
            sw = np.maximum(np.abs(wfold).max(axis=0) / _I8MAX, 1e-12)
            amax_int = float((hmax[i] / sw).max())
            pqm = _decompose(amax_int / _I8MAX)
            steps.append(("int",) + pqm)
            pp, qq, mm = pqm
            u = sw * (2.0 ** (pp + qq) / mm)
    wfold = p["feature_w"] * u[:, None]
    sw_f = np.maximum(np.abs(wfold).max(axis=0) / _I8MAX, 1e-12)
    amax_int_f = float((fmax / sw_f).max())
    feat_pqm = ("int",) + _decompose(amax_int_f / _I8MAX)
    return QuantCalib(sh0=sh0, steps=tuple(steps), feat=feat_pqm)


def _scale_of(step) -> float:
    """The requant step's effective scalar S (h_q ~ a_i32 / S)."""
    _, p, q, m = step
    return (2.0 ** (p + q)) / m


def qpack_nerf_params(
    params: dict,
    cfg: NeRFConfig,
    calib: QuantCalib,
    multires: int = 10,
    multires_views: int = 4,
    dtype=jnp.bfloat16,
    stuff_raw: bool = True,
) -> dict:
    """Trace-time int8 repack: pack_nerf_params, then quantize the h-chain.

    Replaces trunk_w[1..D-1] / feature_w / views_wf with int8 tensors (per
    output channel scales folded forward), adds the int32 bias rows and
    fp32 merge rows the kernel epilogues need, and folds the final
    activation scales into the alpha head. Keys not touched keep the
    pack_nerf_params meaning.
    """
    from nerf_sampling_tpu.kernels.fused_nerf import pack_nerf_params

    p = pack_nerf_params(
        params, cfg, multires, multires_views, jnp.float32,
        stuff_raw=stuff_raw,
    )
    skips = set(cfg.skips)

    def qweights(w, u):
        wfold = w * u[:, None]
        sw = jnp.maximum(jnp.abs(wfold).max(axis=0) / _I8MAX, 1e-12)
        w_q = jnp.clip(jnp.round(wfold / sw), -127, 127).astype(jnp.int8)
        return w_q, sw

    out: dict = {
        "w0x": p["w0x"].astype(dtype),
        "w0s": p["w0s"].astype(dtype),
        "b0": p["trunk_b"][0],
        "trunk_wq": [None],
        "trunk_row": [None],  # per-layer [1, W] row: int32 bias | fp32 sw
        "skip_wx": {},
        "skip_ws": {},
        "skip_b": {},
    }
    u = jnp.full((cfg.W,), calib.sh0, jnp.float32)
    for i in range(1, cfg.D):
        step = calib.steps[i - 1]
        w_q, sw = qweights(p["trunk_w"][i], u)
        out["trunk_wq"].append(w_q)
        if step[0] == "skip":
            out["skip_wx"][i] = p["skip_wx"][i].astype(dtype)
            out["skip_ws"][i] = p["skip_ws"][i].astype(dtype)
            out["skip_b"][i] = p["trunk_b"][i].reshape(1, -1)
            out["trunk_row"].append(sw.reshape(1, -1))  # fp32 dequant row
            u = jnp.full((cfg.W,), 1.0 / step[1], jnp.float32)
        else:
            b_z = jnp.clip(
                jnp.round(p["trunk_b"][i] / sw), -(2.0**30), 2.0**30
            ).astype(jnp.int32)
            out["trunk_row"].append(b_z.reshape(1, -1))
            u = sw * _scale_of(step)

    f_q, sw_f = qweights(p["feature_w"], u)
    out["feature_wq"] = f_q
    out["feature_bz"] = (
        jnp.clip(jnp.round(p["feature_b"] / sw_f), -(2.0**30), 2.0**30)
        .astype(jnp.int32)
        .reshape(1, -1)
    )
    u_f = sw_f * _scale_of(calib.feat)

    v_q, sw_v = qweights(p["views_wf"], u_f)
    out["views_wq"] = v_q
    out["views_sw"] = sw_v.reshape(1, -1)
    out["views_wx"] = p["views_wx"].astype(dtype)
    out["views_ws"] = p["views_ws"].astype(dtype)
    out["views_b"] = p["views_b"]
    out["head_rgb4"] = p["head_rgb4"].astype(dtype)
    # fold the last trunk activation's per-channel scales into the alpha head
    out["head_alpha4"] = (p["head_alpha4"] * u[:, None]).astype(dtype)
    out["head_b4"] = p["head_b4"]
    return out


def flatten_qpacked(qp: dict) -> list:
    flat = [qp["w0x"], qp["w0s"], qp["b0"]]
    flat += [w for w in qp["trunk_wq"] if w is not None]
    flat += [r for r in qp["trunk_row"] if r is not None]
    for i in sorted(qp["skip_wx"]):
        flat += [qp["skip_wx"][i], qp["skip_ws"][i], qp["skip_b"][i]]
    flat += [
        qp["views_wx"], qp["views_ws"], qp["views_wq"], qp["views_sw"],
        qp["views_b"], qp["feature_wq"], qp["feature_bz"],
        qp["head_rgb4"], qp["head_alpha4"], qp["head_b4"],
    ]
    return flat


def unpack_qwrefs(cfg: NeRFConfig, wrefs, calib: QuantCalib) -> dict:
    """Name the flat quantized-weight ref sequence (flatten_qpacked)."""
    it = iter(wrefs)
    d: dict = {"qplan": calib}
    d["w0x"], d["w0s"], d["b0"] = next(it), next(it), next(it)
    d["trunk_wq"] = [None] + [next(it) for _ in range(cfg.D - 1)]
    d["trunk_row"] = [None] + [next(it) for _ in range(cfg.D - 1)]
    d["skip"] = {
        i: (next(it), next(it), next(it))
        for i in range(1, cfg.D)
        if (i - 1) in cfg.skips
    }
    d["views_wx"], d["views_ws"] = next(it), next(it)
    d["views_wq"], d["views_sw"], d["views_b"] = next(it), next(it), next(it)
    d["feature_wq"], d["feature_bz"] = next(it), next(it)
    d["head_rgb4"], d["head_alpha4"], d["head_b4"] = (
        next(it), next(it), next(it),
    )
    return d


def _requant_int(a, step, lo: int):
    """clip((a >> p) * m >> q, lo, 127).astype(int8) with round-to-nearest
    shift bias — the probe-measured scalar integer epilogue.

    The pre-shifted accumulator is clamped to +-2^15 before the multiply:
    m < 2^15, so the product then stays inside int32. Without the clamp an
    activation beyond ~2x the calibrated amax (margin=1.0) overflows a*m
    and wraps to the LOW rail — inverting large activations instead of
    saturating them at 127 (one cheap VPU clamp buys true saturation).
    """
    _, p, q, m = step
    if p > 0:
        # (a + 2^(p-1)) >> p, written shift-first so the rounding add can
        # never overflow int32 for accumulators near the rail; for floor
        # (arithmetic) shifts the two forms are bit-identical for all a.
        a = (a >> p) + ((a >> (p - 1)) & 1)
    a = jnp.clip(a, -(1 << 15), (1 << 15) - 1)
    a = a * m
    if q > 0:
        a = (a + (1 << (q - 1))) >> q
    return jnp.clip(a, lo, 127).astype(jnp.int8)


def _requant_fp32(h, inv_sh: float):
    """Nonneg fp32 -> int8 via scalar scale (round-half-up)."""
    return jnp.minimum(h * inv_sh + 0.5, 127.0).astype(jnp.int8)


def mlp_forward_affine_q(
    cfg: NeRFConfig,
    dtype,
    S,
    w: dict,
    heads: str = "full",
):
    """The int8 counterpart of ops.mlp_forward_affine's matmul chain.

    S: the [SC*R, PAD] bf16 PE block (built by the caller exactly as in
    the bf16 path). Returns the same [SC*R, 4] fp32 raw output.
    """
    acc32 = jnp.int32
    calib: QuantCalib = w["qplan"]

    h0 = jax.nn.relu(
        jnp.dot(S, w["w0s"][:], preferred_element_type=jnp.float32)
        + w["b0"][:]
    )
    h_q = _requant_fp32(h0, 1.0 / calib.sh0)

    for i in range(1, cfg.D):
        step = calib.steps[i - 1]
        z = jnp.dot(h_q, w["trunk_wq"][i][:], preferred_element_type=acc32)
        if step[0] == "skip":
            skip_wx, skip_ws, skip_b = w["skip"][i]
            zf = (
                z.astype(jnp.float32) * w["trunk_row"][i][:]
                + jnp.dot(S, skip_ws[:], preferred_element_type=jnp.float32)
                + skip_b[:]
            )
            h_q = _requant_fp32(jax.nn.relu(zf), step[1])
        else:
            a = jnp.maximum(z + w["trunk_row"][i][:], 0)
            h_q = _requant_int(a, step, 0)

    # alpha head: final u folded into the head weights at pack time
    h_bf = h_q.astype(dtype)
    alpha_part = jnp.dot(
        h_bf, w["head_alpha4"][:], preferred_element_type=jnp.float32
    )
    if heads == "sigma":
        return alpha_part + w["head_b4"][:]

    f = jnp.dot(h_q, w["feature_wq"][:], preferred_element_type=acc32)
    f_q = _requant_int(f + w["feature_bz"][:], calib.feat, -127)

    v = jnp.dot(f_q, w["views_wq"][:], preferred_element_type=acc32)
    hv = jax.nn.relu(
        v.astype(jnp.float32) * w["views_sw"][:]
        + jnp.dot(S, w["views_ws"][:], preferred_element_type=jnp.float32)
        + w["views_b"][:]
    ).astype(dtype)
    return (
        jnp.dot(hv, w["head_rgb4"][:], preferred_element_type=jnp.float32)
        + alpha_part
        + w["head_b4"][:]
    )
