"""Fused NeRF-MLP Pallas kernel: embedded points -> raw (rgb, sigma).

Replaces the reference's run_network + NeRF.forward hot path
(Trainer.py:789-806, run_nerf_helpers.py:109-134) for use_viewdirs models.

Layout strategy (measured on TPU v5e; see kernels/__init__.py):
- The caller provides positional encodings; the wrapper packs them into one
  lane-aligned [N, PAD=128] buffer in the kernel compute dtype (pts cols
  [0, Cp), views cols [Cp, Cp+Cv), zero pad). PE itself is cheap elementwise
  work XLA fuses on its own; the kernel's job is the matmul chain.
- Weights are repacked host-side (pack_nerf_params) so every concat in the
  reference architecture becomes a sum of two matmuls:
    skip layer:  cat([pts_emb, h]) @ W  ==  emb_pad @ We_pad + h @ Wh
    views head:  cat([feature, views]) @ W == feature @ Wf + emb_pad @ Wv_pad
  and the two output heads collapse into one 4-column dot-sum:
    out = hv @ Wrgb4 + h @ Walpha4 + bias4
  (a trailing jnp.concatenate([rgb, alpha]) costs a lane relayout that
  halved throughput in practice — hence the packed head).
- Grid over row tiles of N; all weights stay in VMEM across programs
  (constant index_map, ~1.2 MB bf16); inter-layer activations never touch
  HBM. bf16 MXU math with fp32 accumulation (the MXU requires 32-bit acc).

Measured: 95 Mpts/s on v5e (8x256 viewdirs NeRF) vs 22 Mpts/s for the fp32
HIGHEST XLA path and 71 Mpts/s for unfused bf16 XLA.

Autodiff: the kernel defines no VJP — use it for rendering/eval; training
steps keep the XLA path (gradients flow through NeRF inputs even when only
DepthNet trains).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_sampling_tpu.models.nerf import NeRFConfig

PAD = 128  # lane-aligned width of the combined embedding buffer
_TILE = 2048  # rows per grid program (sweet spot in the tile sweep)


def pack_nerf_params(params: dict, cfg: NeRFConfig, dtype=jnp.bfloat16) -> dict:
    """Repack a NeRF param pytree for the fused kernel (see module doc).

    Pure jnp — jit-compatible; under jit XLA hoists it out of the render
    loop as long as params are invariant.
    """
    if not cfg.use_viewdirs:
        raise ValueError("fused kernel requires use_viewdirs=True")
    Cp, Cv, W = cfg.input_ch, cfg.input_ch_views, cfg.W
    if Cp + Cv > PAD:
        raise ValueError(f"embedding width {Cp + Cv} exceeds PAD={PAD}")

    def cast(x):
        return x.astype(dtype)

    def pad_rows(w, row_offset):
        out = jnp.zeros((PAD, w.shape[1]), dtype)
        return jax.lax.dynamic_update_slice(out, cast(w), (row_offset, 0))

    packed: dict[str, Any] = {"trunk_w": [], "trunk_b": [], "skip_w": {}}
    for i, layer in enumerate(params["pts_linears"]):
        w, b = layer["weight"], layer["bias"]
        if i == 0:
            packed["trunk_w"].append(pad_rows(w, 0))  # [PAD, W]
        elif (i - 1) in cfg.skips:
            # reference concat order: cat([input_pts, h]) (helpers.py:118)
            packed["skip_w"][i] = pad_rows(w[:Cp], 0)  # emb part
            packed["trunk_w"].append(cast(w[Cp:]))  # h part [W, W]
        else:
            packed["trunk_w"].append(cast(w))
        packed["trunk_b"].append(b.astype(jnp.float32))

    packed["feature_w"] = cast(params["feature_linear"]["weight"])
    packed["feature_b"] = params["feature_linear"]["bias"].astype(jnp.float32)
    vw = params["views_linears"][0]["weight"]  # [W + Cv, W//2], cat([feature, views])
    packed["views_wf"] = cast(vw[:W])
    packed["views_wv"] = pad_rows(vw[W:], Cp)  # views rows live at offset Cp
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
    flat = list(packed["trunk_w"]) + list(packed["trunk_b"])
    for i in sorted(packed["skip_w"]):
        flat.append(packed["skip_w"][i])
    flat += [
        packed["feature_w"],
        packed["feature_b"],
        packed["views_wf"],
        packed["views_wv"],
        packed["views_b"],
        packed["head_rgb4"],
        packed["head_alpha4"],
        packed["head_b4"],
    ]
    return flat


def _kernel_body(cfg: NeRFConfig, dtype, refs):
    emb_ref, out_ref = refs[0], refs[-1]
    it = iter(refs[1:-1])

    def nxt():
        return next(it)[:]

    acc = jnp.float32
    emb = emb_ref[:]  # [TILE, PAD] in compute dtype
    trunk_w = [nxt() for _ in range(cfg.D)]
    trunk_b = [nxt() for _ in range(cfg.D)]
    skip_w = {i: nxt() for i in range(1, cfg.D) if (i - 1) in cfg.skips}
    feature_w, feature_b = nxt(), nxt()
    views_wf, views_wv, views_b = nxt(), nxt(), nxt()
    head_rgb4, head_alpha4, head_b4 = nxt(), nxt(), nxt()

    h = None
    for i in range(cfg.D):
        if i == 0:
            z = jnp.dot(emb, trunk_w[i], preferred_element_type=acc)
        elif i in skip_w:
            z = jnp.dot(h, trunk_w[i], preferred_element_type=acc) + jnp.dot(
                emb, skip_w[i], preferred_element_type=acc
            )
        else:
            z = jnp.dot(h, trunk_w[i], preferred_element_type=acc)
        h = jax.nn.relu(z + trunk_b[i]).astype(dtype)

    feature = (
        jnp.dot(h, feature_w, preferred_element_type=acc) + feature_b
    ).astype(dtype)
    hv = jax.nn.relu(
        jnp.dot(feature, views_wf, preferred_element_type=acc)
        + jnp.dot(emb, views_wv, preferred_element_type=acc)
        + views_b
    ).astype(dtype)
    out_ref[:] = (
        jnp.dot(hv, head_rgb4, preferred_element_type=acc)
        + jnp.dot(h, head_alpha4, preferred_element_type=acc)
        + head_b4
    )


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "tile", "interpret"))
def _fused_call(emb, packed_flat, cfg, dtype, tile, interpret):
    def kern(*refs):
        _kernel_body(cfg, dtype, refs)

    w_specs = [
        pl.BlockSpec(
            w.shape,
            lambda i, nd=len(w.shape): (0,) * nd,  # nd bound per-weight
            memory_space=pltpu.VMEM,
        )
        for w in packed_flat
    ]
    return pl.pallas_call(
        kern,
        grid=(emb.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + w_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((emb.shape[0], 4), jnp.float32),
        interpret=interpret,
    )(emb, *packed_flat)


def fused_nerf_apply(
    params: dict,
    cfg: NeRFConfig,
    pts_emb: jnp.ndarray,
    views_emb: jnp.ndarray,
    *,
    dtype=jnp.bfloat16,
    tile: int = _TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Evaluate the NeRF MLP on embedded inputs with the fused kernel.

    Args:
        params: NeRF param pytree (models.nerf layout).
        pts_emb: [..., input_ch] positional-encoded points.
        views_emb: [..., input_ch_views] encoded view dirs (broadcastable to
            pts_emb's batch shape, e.g. per-ray dirs vs per-sample points).
        dtype: kernel compute dtype (bf16 default; f32 for parity tests).
        tile: rows per grid program.
        interpret: Pallas interpret mode (CPU tests).

    Returns [..., 4] fp32 raw output matching models.nerf.nerf_apply up to
    the chosen compute dtype (~0.2% mean relative error for bf16).
    """
    batch_shape = pts_emb.shape[:-1]
    Cp, Cv = cfg.input_ch, cfg.input_ch_views
    pts_flat = pts_emb.reshape(-1, Cp)
    views_flat = jnp.broadcast_to(views_emb, batch_shape + (Cv,)).reshape(-1, Cv)
    n = pts_flat.shape[0]

    emb = jnp.zeros((n, PAD), dtype)
    emb = emb.at[:, :Cp].set(pts_flat.astype(dtype))
    emb = emb.at[:, Cp : Cp + Cv].set(views_flat.astype(dtype))

    tile = min(tile, max(8, n))
    pad = (-n) % tile
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((pad, PAD), emb.dtype)], 0)

    packed = pack_nerf_params(params, cfg, dtype)
    packed_flat = tuple(_flatten_packed(packed))
    out = _fused_call(emb, packed_flat, cfg, dtype, tile, interpret)
    return out[:n].reshape(*batch_shape, 4)
