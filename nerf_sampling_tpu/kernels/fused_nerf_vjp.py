"""Custom-VJP fused NeRF MLP: training-grade forward AND backward kernels.

Round 1 left every gradient step on the fp32 XLA path because no Pallas
kernel had a VJP; this module closes that gap for the hot op (PE + 8x256
viewdirs MLP, reference run_nerf_helpers.py:109-134 + Trainer.py:789-806).

Design (flash-attention-style recompute):
- forward = the existing fused_nerf kernel (kernels/fused_nerf.py) — bf16
  matmuls, fp32 PE/accum, activations never leave VMEM.
- backward = ONE kernel per row tile that RECOMPUTES the forward
  activations in VMEM (no residual HBM traffic beyond x and g) and then
  backpropagates: input grads dx stream out per tile; weight grads
  accumulate in fp32 across the sequential grid (constant-index outputs
  stay VMEM-resident, program 0 initializes, later programs add).
- the custom_vjp sits at the PACKED-weights level (_packed_apply); the
  public wrapper packs the original param pytree with jnp ops, so jax
  differentiates the pack transform itself and grads land back in the
  models.nerf layout automatically.

Weight-grad matmuls contract the row axis (h^T @ g as dot_general over
dim 0) with fp32 accumulation; relu masks are recomputed from the
activations (relu(z) > 0 <=> z > 0).
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
    _fused_call,
    _pe_matrices,
    pack_nerf_params,
)
from nerf_sampling_tpu.kernels.fused_render import TPU_VMEM_LIMIT
from nerf_sampling_tpu.models.nerf import NeRFConfig

_TILE = 1024  # rows per backward program (recompute keeps ~10 [T,256] bufs;
# measured on-chip r3, dispatch-latency-amortized fwd+bwd, flagship 8x256:
#   tile  512: 82 TFLOP/s issued @ n=64k, 126 @ n=192k
#   tile 1024: 89 TFLOP/s issued @ n=64k, 139 @ n=192k   <- best
#   tile 2048: 88 / 135
# i.e. the kernel is at 64-70% of the 197.7 bf16 ceiling by conservative
# 6F accounting — the r2 "38%" figure was dispatch-latency pollution, and
# the two-phase partials-to-HBM variant targets a sequential-accumulation
# bottleneck that the tile sweep shows does not exist (scripts/
# bench_bwd_kernel.py).
_ACC = jnp.float32


def _dotT(a, b):
    """a^T @ b contracting the row axis: [T, M], [T, N] -> [M, N] fp32."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_ACC,
    )


def _dotNT(a, bT_ref):
    """a @ b^T as a plain matmul against a PRE-TRANSPOSED constant.

    The backward needs w^T for every dL/dh hop; transposing inside the
    kernel would relayout each [256, 256] weight in every one of the
    hundreds of sequential grid programs, so _bwd_call ships transposed
    copies as extra VMEM-resident constants instead.
    """
    return jnp.dot(a, bT_ref[:], preferred_element_type=_ACC)


def _colsum(x):
    """Sum rows -> [1, N] (ones-row matmul; Mosaic rejects axis-0 reduces)."""
    return jnp.dot(jnp.ones((1, x.shape[0]), _ACC), x, preferred_element_type=_ACC)


def _bwd_kernel(cfg: NeRFConfig, dtype, n_w, want_dx, refs):
    """Recompute-forward + backward for one [T, XDIM] row tile.

    refs: x, g, F, P, *weights(n_w), *weightsT(n_w, 2-D entries
    pre-transposed for the dL/dh hops), [dx,] *dweights(n_w, same order).
    want_dx=False drops the whole dL/dx chain (the dX/dS hops and the sin
    backward) — the hierarchical train losses never differentiate w.r.t.
    the sample points (z is detached per the reference, o/d are data), and
    the chain is a measurable slice of the backward's matmul passes.
    """
    x_ref, g_ref, F_ref, P_ref = refs[0], refs[1], refs[2], refs[3]
    wrefs = refs[4 : 4 + n_w]
    wTrefs = refs[4 + n_w : 4 + 2 * n_w]
    if want_dx:
        dx_ref = refs[4 + 2 * n_w]
        dwrefs = refs[5 + 2 * n_w :]
    else:
        dx_ref = None
        dwrefs = refs[4 + 2 * n_w :]
    assert len(dwrefs) == n_w

    from nerf_sampling_tpu.kernels import ops

    w = ops.unpack_wrefs(cfg, wrefs)
    wT = ops.unpack_wrefs(cfg, wTrefs)
    # name -> flat position (mirrors fused_nerf._flatten_packed)
    order: list[tuple] = [("w0x",), ("w0s",)]
    order += [("trunk_w", i) for i in range(1, cfg.D)]
    order += [("trunk_b", i) for i in range(cfg.D)]
    for i in sorted(k for k in range(1, cfg.D) if (k - 1) in cfg.skips):
        order += [("skip_wx", i), ("skip_ws", i)]
    order += [
        ("views_wx",), ("views_ws",), ("views_wf",), ("views_b",),
        ("feature_w",), ("feature_b",),
        ("head_rgb4",), ("head_alpha4",), ("head_b4",),
    ]
    pos = {k: i for i, k in enumerate(order)}
    assert len(order) == n_w

    first = pl.program_id(0) == 0

    def emit(key, val):
        """Accumulate a weight grad across the sequential grid."""
        ref = dwrefs[pos[key]]
        if val.ndim == 1:
            val = val[None]
        if ref.shape != val.shape:  # [1, N] -> [N]-shaped (1, N) refs match
            val = val.reshape(ref.shape)

        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + val

    # ---- forward recompute (mirrors the fused-nerf kernel body, keeping activations)
    X32 = x_ref[:]
    F, P = F_ref[:], P_ref[:]
    A = jnp.dot(X32, F, preferred_element_type=_ACC) + P
    S32 = jnp.sin(A)
    X = X32.astype(dtype)
    S = S32.astype(dtype)

    def emb_dot(wx, ws):
        return jnp.dot(X, wx[:], preferred_element_type=_ACC) + jnp.dot(
            S, ws[:], preferred_element_type=_ACC
        )

    hs = []
    h = None
    for i in range(cfg.D):
        if i == 0:
            z = emb_dot(w["w0x"], w["w0s"])
        elif i in w["skip"]:
            z = jnp.dot(
                h, w["trunk_w"][i][:], preferred_element_type=_ACC
            ) + emb_dot(*w["skip"][i])
        else:
            z = jnp.dot(h, w["trunk_w"][i][:], preferred_element_type=_ACC)
        h = jax.nn.relu(z + w["trunk_b"][i][:]).astype(dtype)
        hs.append(h)

    feature = (
        jnp.dot(h, w["feature_w"][:], preferred_element_type=_ACC)
        + w["feature_b"][:]
    ).astype(dtype)
    zv = (
        jnp.dot(feature, w["views_wf"][:], preferred_element_type=_ACC)
        + emb_dot(w["views_wx"], w["views_ws"])
        + w["views_b"][:]
    )
    hv = jax.nn.relu(zv).astype(dtype)

    # ---- backward
    g = g_ref[:]  # [T, 4] fp32
    g16 = g.astype(dtype)

    emit(("head_b4",), _colsum(g))
    emit(("head_rgb4",), _dotT(hv, g16))
    emit(("head_alpha4",), _dotT(hs[-1], g16))

    d_hv = _dotNT(g16, wT["head_rgb4"])
    d_zv = jnp.where(zv > 0, d_hv, 0.0)
    d_zv16 = d_zv.astype(dtype)
    emit(("views_b",), _colsum(d_zv))
    emit(("views_wf",), _dotT(feature, d_zv16))
    emit(("views_wx",), _dotT(X, d_zv16))
    emit(("views_ws",), _dotT(S, d_zv16))
    d_feature = _dotNT(d_zv16, wT["views_wf"])
    if want_dx:
        dX = _dotNT(d_zv16, wT["views_wx"])
        dS = _dotNT(d_zv16, wT["views_ws"])

    emit(("feature_b",), _colsum(d_feature))
    emit(("feature_w",), _dotT(hs[-1], d_feature.astype(dtype)))
    d_h = _dotNT(g16, wT["head_alpha4"]) + _dotNT(
        d_feature.astype(dtype), wT["feature_w"]
    )

    for i in range(cfg.D - 1, -1, -1):
        # fp32 compare: Mosaic has no bf16 cmpf on this target
        d_z = jnp.where(hs[i].astype(_ACC) > 0, d_h, 0.0)
        d_z16 = d_z.astype(dtype)
        emit(("trunk_b", i), _colsum(d_z))
        if i == 0:
            emit(("w0x",), _dotT(X, d_z16))
            emit(("w0s",), _dotT(S, d_z16))
            if want_dx:
                dX = dX + _dotNT(d_z16, wT["w0x"])
                dS = dS + _dotNT(d_z16, wT["w0s"])
        elif i in w["skip"]:
            emit(("trunk_w", i), _dotT(hs[i - 1], d_z16))
            emit(("skip_wx", i), _dotT(X, d_z16))
            emit(("skip_ws", i), _dotT(S, d_z16))
            if want_dx:
                wxT, wsT = wT["skip"][i]
                dX = dX + _dotNT(d_z16, wxT)
                dS = dS + _dotNT(d_z16, wsT)
            d_h = _dotNT(d_z16, wT["trunk_w"][i])
        else:
            emit(("trunk_w", i), _dotT(hs[i - 1], d_z16))
            d_h = _dotNT(d_z16, wT["trunk_w"][i])

    if want_dx:
        # sin backward: S32 = sin(A), A = X32 @ F + P (fp32 end to end)
        dA = dS * jnp.cos(A)
        dx_ref[:] = dX + jax.lax.dot_general(
            dA, F, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_ACC,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "dtype", "tile", "interpret", "want_dx")
)
def _bwd_call(x, g, F, P, packed_flat, cfg, dtype, tile, interpret,
              want_dx=True):
    n_w = len(packed_flat)

    def kern(*refs):
        _bwd_kernel(cfg, dtype, n_w, want_dx, refs)

    n = x.shape[0]
    # transposed copies for the dL/dh hops (see _dotNT); 1-D biases are
    # never _dotNT'd — pass them through so unpack_wrefs sees one layout
    packed_T = tuple(w.T if w.ndim == 2 else w for w in packed_flat)
    consts = (F, P) + tuple(packed_flat) + packed_T
    const_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=len(w.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in consts
    ]

    def grad_struct(w):
        shape = w.shape if len(w.shape) > 1 else (1,) + w.shape
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    dw_shapes = [grad_struct(w) for w in packed_flat]
    dw_specs = [
        pl.BlockSpec(s.shape, lambda i, nd=len(s.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for s in dw_shapes
    ]
    dx_specs = (
        [pl.BlockSpec((tile, XDIM), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        if want_dx
        else []
    )
    dx_shapes = [jax.ShapeDtypeStruct((n, XDIM), jnp.float32)] if want_dx else []
    out = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, XDIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + const_specs,
        out_specs=dx_specs + dw_specs,
        out_shape=dx_shapes + dw_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=TPU_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, *consts)
    if want_dx:
        dx, dws = out[0], out[1:]
    else:
        dx, dws = jnp.zeros_like(x), out
    # restore 1-D bias shapes
    dws = tuple(
        dw.reshape(w.shape).astype(w.dtype)
        for dw, w in zip(dws, packed_flat)
    )
    return dx, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _packed_apply(packed_flat, x, cfg, dtype, tile, interpret, want_dx):
    F, P = _pe_matrices_cached(cfg)
    return _fused_call(x, F, P, tuple(packed_flat), cfg, dtype, tile, interpret)


def _packed_apply_fwd(packed_flat, x, cfg, dtype, tile, interpret, want_dx):
    out = _packed_apply(packed_flat, x, cfg, dtype, tile, interpret, want_dx)
    return out, (tuple(packed_flat), x)


def _packed_apply_bwd(cfg, dtype, tile, interpret, want_dx, res, g):
    packed_flat, x = res
    F, P = _pe_matrices_cached(cfg)
    dx, dws = _bwd_call(
        x, g.astype(jnp.float32), F, P, packed_flat, cfg, dtype, tile,
        interpret, want_dx=want_dx,
    )
    return dws, dx


_packed_apply.defvjp(_packed_apply_fwd, _packed_apply_bwd)

_PE_CACHE: dict = {}


def _pe_matrices_cached(cfg: NeRFConfig):
    key = (cfg.input_ch, cfg.input_ch_views)
    if key not in _PE_CACHE:
        multires = (cfg.input_ch - 3) // 6
        multires_views = (cfg.input_ch_views - 3) // 6 if cfg.input_ch_views else 0
        _PE_CACHE[key] = _pe_matrices(multires, multires_views)
    return _PE_CACHE[key]


def fused_nerf_train_apply(
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
    input_grads: bool = True,
) -> jnp.ndarray:
    """Differentiable PE + NeRF MLP on raw inputs (training path).

    Forward-identical to kernels.fused_nerf.fused_nerf_apply; gradients
    w.r.t. ``params`` (all leaves, original pytree layout — jax transposes
    the packing transform) and w.r.t. ``pts``/``viewdirs`` (through the
    fp32 PE) come from the recompute backward kernel.

    ``input_grads=False`` compiles a backward without the dL/dx chain and
    returns ZERO input cotangents — only valid when the loss does not
    differentiate through pts/viewdirs (true for the hierarchical train
    losses: z is detached per the reference, rays are data).
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

    packed = pack_nerf_params(params, cfg, multires, multires_views, dtype)
    packed_flat = tuple(_flatten_packed(packed))
    out = _packed_apply(
        packed_flat, x, cfg, dtype, tile, interpret, bool(input_grads)
    )
    return out[:n].reshape(*batch_shape, 4)
