"""Fused DepthNet Pallas kernel: embedded ray features -> depth.

Replaces the DepthNet forward hot path (models/depth_net.py, reference
depth_nets/depth_net.py:117-169) for rendering. In the DepthNet render mode
the depth prediction (~8.5 MFLOP/ray for the flagship 10x256 config)
dominates the 2-sample NeRF population queries, so this kernel is the
fast-render enabler.

Layout strategy (mirrors kernels/fused_nerf.py):
- Inputs are two lane-aligned buffers:
    A [N, 128]: origin embedding cols [0, 63) | direction cols [63, 126)
    B [N, 128]: intersection-points embedding cols [0, 126)
  (computed outside: PE + ray-sphere intersection are cheap XLA work).
- Every concat becomes a sum of matmuls with offset-padded weights:
    tower layer i>0: cat([h, emb]) @ W == h @ Wh + buf @ We_pad
    tower layer 0:   cat([emb, emb]) @ W == buf @ (W_hi + W_lo)_pad
    cat trunk in:    cat([o,d,i,o_emb,d_emb,i_emb]) @ W ==
                     o@Wo + d@Wd + i@Wi + A@Wa_pad + B@Wb_pad
- Towers have NO inter-layer activation (replicating the reference's
  constructed-but-never-applied LeakyReLU, depth_net.py:140-156); the cat
  trunk applies LeakyReLU(0.01); head is sigmoid scaled to [near, far].
- bf16 MXU math, fp32 accumulation; weights VMEM-resident across programs.

NaN semantics: rays missing the bounding sphere carry NaN intersection
embeddings; NaN propagates through the matmul chain to the output depth,
matching the reference. No VJP — eval only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.core.geometry import find_intersection_points_with_sphere
from nerf_sampling_tpu.models.depth_net import DepthNetConfig

PAD = 128
_TILE = 1024


def pack_depth_net_params(params: dict, cfg: DepthNetConfig, dtype=jnp.bfloat16):
    """Repack DepthNet params for the fused kernel (see module doc)."""
    eo, ed, ei = cfg.origin_dims, cfg.direction_dims, cfg.intersection_dims
    if max(eo + ed, ei) > PAD:
        raise ValueError("embedding widths exceed PAD")
    H = cfg.hidden_sizes
    if len(set(H)) != 1:
        raise ValueError("fused kernel requires uniform hidden sizes")

    def cast(x):
        return x.astype(dtype)

    def pad_rows(w, off):
        out = jnp.zeros((PAD, w.shape[1]), dtype)
        return jax.lax.dynamic_update_slice(out, cast(w), (off, 0))

    def tower(layers, emb_dim, off):
        tw_h, tw_e = [], []
        for i, layer in enumerate(layers):
            w = layer["weight"]
            if i == 0:
                # cat([emb, emb]) @ W == emb @ (W_top + W_bottom)
                tw_h.append(None)
                tw_e.append(pad_rows(w[:emb_dim] + w[emb_dim:], off))
            else:
                # forward concat order: cat([h, emb]) (depth_net.py:139)
                tw_h.append(cast(w[: H[0]]))
                tw_e.append(pad_rows(w[H[0] :], off))
        tb = [layer["bias"].astype(jnp.float32) for layer in layers]
        return tw_h, tw_e, tb

    packed = {}
    packed["o"] = tower(params["origin_layers"], eo, 0)
    packed["d"] = tower(params["direction_layers"], ed, eo)
    packed["i"] = tower(params["intersection_layers"], ei, 0)

    # cat trunk layer 0: rows [o(H) | d(H) | i(H) | o_emb | d_emb | i_emb]
    w0 = params["cat_layers"][0]["weight"]
    Hn = H[-1]
    ofs = 0
    packed["cat0_o"] = cast(w0[ofs : ofs + Hn]); ofs += Hn
    packed["cat0_d"] = cast(w0[ofs : ofs + Hn]); ofs += Hn
    packed["cat0_i"] = cast(w0[ofs : ofs + Hn]); ofs += Hn
    wa = jnp.zeros((PAD, w0.shape[1]), dtype)
    wa = jax.lax.dynamic_update_slice(wa, cast(w0[ofs : ofs + eo]), (0, 0))
    wa = jax.lax.dynamic_update_slice(wa, cast(w0[ofs + eo : ofs + eo + ed]), (eo, 0))
    packed["cat0_a"] = wa
    packed["cat0_b"] = pad_rows(w0[ofs + eo + ed :], 0)
    packed["cat_w"] = [cast(l["weight"]) for l in params["cat_layers"][1:]]
    packed["cat_b"] = [l["bias"].astype(jnp.float32) for l in params["cat_layers"]]
    packed["head_w"] = cast(params["to_depth"]["weight"])  # [Hc, 1]
    packed["head_b"] = params["to_depth"]["bias"].astype(jnp.float32)
    return packed


def _flatten(packed):
    flat = []
    for t in ("o", "d", "i"):
        tw_h, tw_e, tb = packed[t]
        flat += [w for w in tw_h if w is not None]
        flat += tw_e
        flat += tb
    flat += [
        packed["cat0_o"], packed["cat0_d"], packed["cat0_i"],
        packed["cat0_a"], packed["cat0_b"],
    ]
    flat += packed["cat_w"]
    flat += packed["cat_b"]
    flat += [packed["head_w"], packed["head_b"]]
    return flat


def _kernel_body(cfg: DepthNetConfig, dtype, refs):
    a_ref, b_ref, out_ref = refs[0], refs[1], refs[-1]
    it = iter(refs[2:-1])

    def nxt():
        return next(it)[:]

    acc = jnp.float32
    n_layers = len(cfg.hidden_sizes)
    A = a_ref[:]
    B = b_ref[:]

    def run_tower(buf):
        tw_h = [nxt() for _ in range(n_layers - 1)]
        tw_e = [nxt() for _ in range(n_layers)]
        tb = [nxt() for _ in range(n_layers)]
        h = None
        for i in range(n_layers):
            z = jnp.dot(buf, tw_e[i], preferred_element_type=acc)
            if i > 0:
                z = z + jnp.dot(h, tw_h[i - 1], preferred_element_type=acc)
            # towers: linear-with-skips, NO activation (reference quirk)
            h = (z + tb[i]).astype(dtype)
        return h

    o = run_tower(A)
    d = run_tower(A)
    i_ = run_tower(B)

    cat0_o, cat0_d, cat0_i, cat0_a, cat0_b = nxt(), nxt(), nxt(), nxt(), nxt()
    cat_w = [nxt() for _ in range(len(cfg.cat_hidden_sizes) - 1)]
    cat_b = [nxt() for _ in range(len(cfg.cat_hidden_sizes))]
    head_w, head_b = nxt(), nxt()

    z = (
        jnp.dot(o, cat0_o, preferred_element_type=acc)
        + jnp.dot(d, cat0_d, preferred_element_type=acc)
        + jnp.dot(i_, cat0_i, preferred_element_type=acc)
        + jnp.dot(A, cat0_a, preferred_element_type=acc)
        + jnp.dot(B, cat0_b, preferred_element_type=acc)
        + cat_b[0]
    )
    h = jnp.where(z > 0, z, 0.01 * z).astype(dtype)  # LeakyReLU(0.01)
    for k, w in enumerate(cat_w):
        z = jnp.dot(h, w, preferred_element_type=acc) + cat_b[k + 1]
        h = jnp.where(z > 0, z, 0.01 * z).astype(dtype)

    depth = jax.nn.sigmoid(
        jnp.dot(h, head_w, preferred_element_type=acc) + head_b
    )
    out_ref[:] = cfg.near * (1 - depth) + cfg.far * depth


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "tile", "interpret"))
def _fused_call(A, B, packed_flat, cfg, dtype, tile, interpret):
    def kern(*refs):
        _kernel_body(cfg, dtype, refs)

    w_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=len(w.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in packed_flat
    ]
    return pl.pallas_call(
        kern,
        grid=(A.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + w_specs,
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(A, B, *packed_flat)


def fused_depth_net_apply(
    params: dict,
    cfg: DepthNetConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    dtype=jnp.bfloat16,
    tile: int = _TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused replacement for models.depth_net.depth_net_apply."""
    eo, ed, ei = cfg.origin_dims, cfg.direction_dims, cfg.intersection_dims
    n = rays_o.shape[0]
    o_emb = positional_encoding(rays_o, cfg.multires)
    d_emb = positional_encoding(rays_d, cfg.multires)
    _, inters = find_intersection_points_with_sphere(
        rays_o, rays_d, cfg.sphere_radius
    )
    i_emb = positional_encoding(inters.reshape(n, 6), cfg.multires)

    A = jnp.zeros((n, PAD), dtype)
    A = A.at[:, :eo].set(o_emb.astype(dtype))
    A = A.at[:, eo : eo + ed].set(d_emb.astype(dtype))
    B = jnp.zeros((n, PAD), dtype)
    B = B.at[:, :ei].set(i_emb.astype(dtype))

    tile = min(tile, max(8, n))
    pad = (-n) % tile
    if pad:
        z = jnp.zeros((pad, PAD), dtype)
        A = jnp.concatenate([A, z], 0)
        B = jnp.concatenate([B, z], 0)

    packed_flat = tuple(_flatten(pack_depth_net_params(params, cfg, dtype)))
    out = _fused_call(A, B, packed_flat, cfg, dtype, tile, interpret)
    return out[:n]
