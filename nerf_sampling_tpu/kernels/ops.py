"""Shared in-kernel building blocks for the fused Pallas render kernels.

Everything here runs INSIDE a Pallas TPU kernel body on VMEM-resident
values and obeys the Mosaic constraints this jax build enforces (see
RESULTS.md): no sublane-axis (axis-0) reductions (expressed as ones-row
matmuls / butterfly rolls instead), no gathers (expressed as masked sweeps),
fp32 positional encoding, bf16 matmuls with fp32 accumulation.

The sample axis is axis 0 (sublanes), the ray axis is axis 1 (lanes) —
the sample-major layout lets per-ray scans/reductions run as full-width
vector ops over the 128-lane ray tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nerf_sampling_tpu.models.nerf import NeRFConfig

_ACC = jnp.float32


def ray_affine_consts(o, d, viewdirs, F, P):
    """Per-ray-tile affine decomposition of the S-matrix argument.

    Sample points are affine in z (pts = o + z*d), so the whole S input —
    PE phases on lanes [0, RAW) AND the raw [pts | viewdirs] passthrough
    lanes [RAW, RAW+6) carried by the extended F (fused_nerf._pe_matrices)
    — is one affine function of z:  arg = A + z*B  with
    A = [o|viewdirs|0] @ F + P and B = [d|0|0] @ F. With the raw rows
    stuffed into the Ws weights (pack_nerf_params stuff_raw=True), S is
    the ONLY matmul input per consumer: the hot loop has no per-chunk
    [*, 8] input build, no small-K emb passes, and no per-consumer
    raw-contribution FMA.

    o/d/viewdirs: [R, 3] fp32. Returns (A, B) [R, PAD] fp32 (the phase
    needs full mantissa).
    """
    acc = _ACC
    R = o.shape[0]
    pad = jnp.zeros((R, F.shape[0] - 6), acc)
    X_o = jnp.concatenate([o, viewdirs, pad], axis=1)
    X_d = jnp.concatenate(
        [d, jnp.zeros((R, F.shape[0] - 3), acc)], axis=1
    )
    return (
        jnp.dot(X_o, F, preferred_element_type=acc) + P,
        jnp.dot(X_d, F, preferred_element_type=acc),
    )


def raw_lane_mask(width: int, raw_base: int) -> jnp.ndarray:
    """[1, width] bool: the S layout's raw passthrough lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return (lane >= raw_base) & (lane < raw_base + 6)


def pe_sin_chunk(consts, zc: jnp.ndarray, dtype, raw_base: int) -> jnp.ndarray:
    """The S matrix for one z chunk -> [SC*R, PAD] bf16.

    arg = A + z*B (one full-width fp32 FMA); sin lanes emit sin(arg), raw
    passthrough lanes emit arg itself (the pts/viewdirs values). Pure VPU
    work; Mosaic overlaps it with the trunk matmuls on its own (an
    explicit software-pipelined variant measured perf-neutral).
    """
    A, B = consts
    SC, R = zc.shape
    z3 = zc[:, :, None]
    arg = (A[None] + z3 * B[None]).reshape(SC * R, A.shape[1])
    return jnp.where(
        raw_lane_mask(A.shape[1], raw_base), arg, jnp.sin(arg)
    ).astype(dtype)


def pe_rotation_consts(consts, P, z0: float, dz: float, raw_base: int):
    """Rotation-recurrence S state for constant-step z (z_s = z0 + s*dz).

    The S matrix needs sin(theta) on sin lanes and cos(theta) on cos lanes
    (the P phase is +pi/2 there), with theta_col = A_col + z * B_col affine
    in z. When the z step is a compile-time CONSTANT (the linspace eval
    grid), sin/cos need evaluating transcendentally only ONCE per ray tile:
    every subsequent sample is the fixed per-lane plane rotation

        (s, c) -> (s*cosd + c*sind, c*cosd - s*sind),   d = B*dz

    i.e. FMAs instead of a VPU transcendental (the measured ~20% sin cost
    of the fused kernel). The lane select (sin lanes emit s, cos lanes
    emit c) is folded into the STATE: E = where(cos_lane, c, s) is the
    emitted vector and G = where(cos_lane, -s, c) its quadrature partner,
    and (E, G) obeys the SAME rotation. The raw passthrough lanes are
    LINEAR in z instead of rotational: there cd=1, sd=0 freezes the
    rotation and a masked per-step delta (= B*dz on raw lanes, 0
    elsewhere) advances the value — folding into the same FMA chain:
    E' = E*cd + (G*sd + delta). The hot loop is pure FMA + the bf16 emit
    cast, no per-sample select. fp32 drift is ~eps per step — orders
    below the kernel's bf16 rounding.

    Returns (E0, G0) state at z0 and (cosd, sind, delta) step constants.
    """
    A, B = consts
    raw = raw_lane_mask(A.shape[1], raw_base)
    A0 = A - P[None, :]  # strip the baked-in cos phase; folded into E/G
    ang0 = A0 + z0 * B
    d = B * dz
    mask_cos = P[None, :] > 0.25
    s0, c0 = jnp.sin(ang0), jnp.cos(ang0)
    E0 = jnp.where(raw, ang0, jnp.where(mask_cos, c0, s0))
    G0 = jnp.where(raw, 0.0, jnp.where(mask_cos, -s0, c0))
    cd = jnp.where(raw, 1.0, jnp.cos(d))
    sd = jnp.where(raw, 0.0, jnp.sin(d))
    delta = jnp.where(raw, d, 0.0)
    return (E0, G0), (cd, sd, delta)


def pe_rotate_chunk(state, rot, SC: int, dtype):
    """Emit one chunk's [SC*R, PAD] S block; advance the rotation state.

    state: (E, G) [R, PAD] fp32 at the chunk's first sample;
    rot: (cosd, sind, delta) from pe_rotation_consts.
    """
    E, G = state
    cosd, sind, delta = rot
    rows = []
    for _ in range(SC):
        rows.append(E.astype(dtype))
        E, G = E * cosd + (G * sind + delta), G * cosd - E * sind
    R, PAD = rows[0].shape
    out = rows[0] if SC == 1 else jnp.stack(rows, 0).reshape(SC * R, PAD)
    return out, (E, G)


class PEOffsetRotation:
    """Statically-scheduled rotation PE for host-known per-ray z offsets.

    The uniform depth population (reference sample_points_around_mean,
    nerf_pytorch/utils.py:231-240) shades z_i = clip(center + off[i],
    near, far) where ``off`` is a HOST-KNOWN sorted grid (linspace with 0
    inserted): consecutive offsets differ by at most 3 distinct deltas
    (the grid step and the two sub-steps around the inserted 0). So the
    PE needs transcendental sin/cos only for the per-tile base and one
    rotation-constant pair per DISTINCT delta (<=3); every sample then
    advances by a statically-scheduled per-lane plane rotation, exactly
    like pe_rotation_consts. Clipped samples emit the boundary sin/cos
    (two extra per-tile evaluations) selected by a per-ray mask; the
    rotation chain itself advances UNCLIPPED so later samples stay exact.

    Raw passthrough lanes ride along linearly (cd=1, sd=0 + masked delta,
    exactly as in pe_rotation_consts), and the boundary emits carry the
    clipped pts values on those lanes.

    Python-side state (the schedule index) — usable only from statically
    unrolled chunk loops.

    scale: optional TRACED [1, 1] multiplier applied to every offset. The
    schedule (which delta fires at each step, delta equality) is decided
    on the static offsets, but all emitted values use offset*scale — so a
    caller can pass the UNIT grid statically and the actual std as traced
    data, and a distance sweep reuses one compiled kernel per sample
    count. The rotation constants were always trace-time tensor math on
    the per-ray B, so a traced scale costs nothing extra per step.
    """

    def __init__(self, consts, P, center_col, offsets, near, far, dtype,
                 raw_base, scale=None):
        import numpy as _np

        A, B = consts
        raw = raw_lane_mask(A.shape[1], raw_base)
        A0 = A - P[None, :]
        mask_cos = P[None, :] > 0.25

        def emit_of(z):
            ang = A0 + z * B
            return jnp.where(
                raw, ang, jnp.where(mask_cos, jnp.cos(ang), jnp.sin(ang))
            )

        offs = _np.asarray(offsets, _np.float32).reshape(-1)
        self._offs = offs
        self._dtype = dtype
        self._scale = scale
        self._i = 0

        def scaled(off):
            return off * scale if scale is not None else off

        # base at the UNCLIPPED z0 = center + off[0]
        ang0 = A0 + (center_col + scaled(float(offs[0]))) * B
        s0, c0 = jnp.sin(ang0), jnp.cos(ang0)
        self._E = jnp.where(raw, ang0, jnp.where(mask_cos, c0, s0))
        self._G = jnp.where(raw, 0.0, jnp.where(mask_cos, -s0, c0))
        # boundary emits for clipped samples (z pinned to near / far)
        self._E_near = emit_of(near)
        self._E_far = emit_of(far)
        self._center = center_col  # [R, 1]
        self._near, self._far = near, far
        # one step-constant triple per distinct inter-sample delta
        deltas = offs[1:] - offs[:-1]
        self._rot = {
            float(d): (
                jnp.where(raw, 1.0, jnp.cos(scaled(float(d)) * B)),
                jnp.where(raw, 0.0, jnp.sin(scaled(float(d)) * B)),
                jnp.where(raw, scaled(float(d)) * B, 0.0),
            )
            for d in _np.unique(deltas)
            if d != 0.0
        }

    def next_chunk(self, SC: int):
        """Emit the next SC samples' [SC*R, PAD] S block."""
        rows = []
        for _ in range(SC):
            off_i = float(self._offs[self._i])
            if self._scale is not None:
                off_i = off_i * self._scale
            zc = self._center + off_i  # [R, 1] unclipped
            emit = jnp.where(
                zc > self._far,
                self._E_far,
                jnp.where(zc < self._near, self._E_near, self._E),
            )
            rows.append(emit.astype(self._dtype))
            if self._i + 1 < len(self._offs):
                d = float(self._offs[self._i + 1] - self._offs[self._i])
                if d != 0.0:
                    cosd, sind, delta = self._rot[d]
                    self._E, self._G = (
                        self._E * cosd + (self._G * sind + delta),
                        self._G * cosd - self._E * sind,
                    )
            self._i += 1
        R, PAD = rows[0].shape
        return rows[0] if SC == 1 else jnp.stack(rows, 0).reshape(SC * R, PAD)


def mlp_forward_affine(
    cfg: NeRFConfig,
    dtype,
    zc: jnp.ndarray,
    consts,
    w: dict,
    heads: str = "full",
    pe_S: jnp.ndarray | None = None,
    raw_base: int = 0,
) -> jnp.ndarray:
    """S matrix + NeRF MLP over a z chunk via the affine-in-z decomposition.

    Requires raw-stuffed weights (pack_nerf_params stuff_raw=True): S
    carries the raw [pts | viewdirs] values in its passthrough lanes, so
    each emb consumer is ONE [*, PAD] @ [PAD, out] matmul — no separate
    raw-contribution FMA. zc: [SC, R] fp32 sample depths; rows of the
    result are s-major (row = s*R + r). Matches mlp_forward(X built from
    o + z*d) up to dtype rounding. The z broadcast runs in [SC, R, C] 3D
    form: Mosaic rejects the [SC, R] -> [SC*R, 1] shape cast, but merging
    leading dims of [SC, R, C] is a supported (free) reshape.

    pe_S: optionally a precomputed [SC*R, PAD] S block (the rotation
    recurrence paths) — skips pe_sin_chunk.
    """
    acc = _ACC

    S = pe_S if pe_S is not None else pe_sin_chunk(consts, zc, dtype, raw_base)

    if "qplan" in w:  # int8 weight set (kernels.quant.unpack_qwrefs)
        from nerf_sampling_tpu.kernels.quant import mlp_forward_affine_q

        return mlp_forward_affine_q(cfg, dtype, S, w, heads=heads)

    h = None
    for i in range(cfg.D):
        if i == 0:
            z = jnp.dot(S, w["w0s"][:], preferred_element_type=acc)
        elif i in w["skip"]:
            z = (
                jnp.dot(h, w["trunk_w"][i][:], preferred_element_type=acc)
                + jnp.dot(S, w["skip"][i][1][:], preferred_element_type=acc)
            )
        else:
            z = jnp.dot(h, w["trunk_w"][i][:], preferred_element_type=acc)
        h = jax.nn.relu(z + w["trunk_b"][i][:]).astype(dtype)

    alpha_part = jnp.dot(h, w["head_alpha4"][:], preferred_element_type=acc)
    if heads == "sigma":
        return alpha_part + w["head_b4"][:]

    feature = (
        jnp.dot(h, w["feature_w"][:], preferred_element_type=acc)
        + w["feature_b"][:]
    ).astype(dtype)
    hv = jax.nn.relu(
        jnp.dot(feature, w["views_wf"][:], preferred_element_type=acc)
        + jnp.dot(S, w["views_ws"][:], preferred_element_type=acc)
        + w["views_b"][:]
    ).astype(dtype)
    return (
        jnp.dot(hv, w["head_rgb4"][:], preferred_element_type=acc)
        + alpha_part
        + w["head_b4"][:]
    )


def unpack_wrefs(cfg: NeRFConfig, wrefs, quant=None) -> dict:
    """Name the flat packed-weight ref sequence (fused_nerf._flatten_packed).

    Returns refs, not values — callers ``[:]``-read only what they use
    (e.g. the sigma-only head skips the views branch entirely).
    With ``quant`` (a kernels.quant.QuantCalib) the sequence is the int8
    layout (kernels.quant.flatten_qpacked) instead.
    """
    if quant is not None:
        from nerf_sampling_tpu.kernels.quant import unpack_qwrefs

        return unpack_qwrefs(cfg, wrefs, quant)
    it = iter(wrefs)
    d: dict = {}
    d["w0x"], d["w0s"] = next(it), next(it)
    d["trunk_w"] = [None] + [next(it) for _ in range(cfg.D - 1)]
    d["trunk_b"] = [next(it) for _ in range(cfg.D)]
    d["skip"] = {
        i: (next(it), next(it)) for i in range(1, cfg.D) if (i - 1) in cfg.skips
    }
    d["views_wx"], d["views_ws"] = next(it), next(it)
    d["views_wf"], d["views_b"] = next(it), next(it)
    d["feature_w"], d["feature_b"] = next(it), next(it)
    d["head_rgb4"], d["head_alpha4"], d["head_b4"] = next(it), next(it), next(it)
    return d


# ---------------------------------------------------------------------------
# axis-0 (sample-axis) scans and reductions — Mosaic-safe formulations
# ---------------------------------------------------------------------------


def exclusive_cumprod_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive product along axis 0 of [S, R] via log-step shifts.

    Equivalent to cumprod(concat([ones, x], 0))[:-1] for ANY S (masked
    Hillis-Steele scan). pltpu.roll + iota masking — no gather, VPU only.
    """
    S = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = x
    shift = 1
    while shift < S:
        rolled = pltpu.roll(y, shift, 0)
        y = jnp.where(row >= shift, y * rolled, y)
        shift *= 2
    y = pltpu.roll(y, 1, 0)
    return jnp.where(row == 0, 1.0, y)


def inclusive_cumsum_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive sum along axis 0 of [S, R] (masked Hillis-Steele, any S)."""
    S = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = x
    shift = 1
    while shift < S:
        rolled = pltpu.roll(y, shift, 0)
        y = jnp.where(row >= shift, y + rolled, y)
        shift *= 2
    return y


def allreduce_max_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """[S, R] -> [S, R] where every row holds the column max.

    Butterfly of circular rolls: after shifts 1,2,4,...,>=S every position
    has seen every offset (max is idempotent, over-coverage is harmless;
    works for any S).
    """
    y = x
    shift = 1
    while shift < x.shape[0]:
        y = jnp.maximum(y, pltpu.roll(y, shift, 0))
        shift *= 2
    return y


def reduce0(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over axis 0: [S, R] -> [1, R] as a ones-row MXU matmul.

    Mosaic rejects sublane-axis reductions outright; the MXU does them for
    free.
    """
    ones_row = jnp.ones((1, x.shape[0]), _ACC)
    return jnp.dot(ones_row, x, preferred_element_type=_ACC)


def argmax_first_axis0(values: jnp.ndarray):
    """One-hot of the FIRST axis-0 argmax per column (jnp.argmax semantics).

    values: [S, R] -> float one-hot [S, R]. Gather-free: butterfly max +
    first-occurrence via masked cumsum.
    """
    m = allreduce_max_axis0(values)
    is_max = (values == m).astype(_ACC)
    first = inclusive_cumsum_axis0(is_max)
    return jnp.where((is_max > 0) & (first == 1.0), 1.0, 0.0)


# ---------------------------------------------------------------------------
# compositing (reference raw2outputs, sampling_trainer.py:153-230)
# ---------------------------------------------------------------------------


def alpha_from_sigma(sigma: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """raw2alpha (nerf_utils.py:27-42): 1 - exp(-relu(sigma) * dists)."""
    return 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)


def sorted_dists(z: jnp.ndarray, d_norm_row: jnp.ndarray) -> jnp.ndarray:
    """dists for ascending z [S, R]: z[s+1]-z[s], 1e10 tail, scaled by |d|."""
    S = z.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    if S > 1:
        dz = pltpu.roll(z, S - 1, 0) - z  # z[s+1]-z[s]; only rows < S-1 used
    else:
        dz = z  # unused: the single row takes the 1e10 tail
    return jnp.where(row == S - 1, 1e10, dz) * d_norm_row


_FAR_SENTINEL = 1e30


def unsorted_weights(
    z: jnp.ndarray,
    sigma: jnp.ndarray,
    d_norm_row: jnp.ndarray,
):
    """Compositing weights for UNSORTED samples, exactly matching a stable
    sort by (z, row-index) followed by sorted compositing.

    For each sample i (storage order):
      dist_i = (smallest z among samples AFTER i in sort order) - z_i,
               or 1e10 if i is last — then scaled by |d|
      T_i    = prod over samples BEFORE i of (1 - alpha_j + 1e-10)
    computed as O(S) masked row sweeps (no sort, no gather). The float
    product order differs from sorted order by multiplication reordering
    only (~1 ulp). z: [S, R]; sigma: [S, R]; d_norm_row: [1, R].

    Returns (weights [S, R], alpha [S, R], dists [S, R]).
    """
    S = z.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)

    next_z = jnp.full(z.shape, _FAR_SENTINEL, _ACC)
    for j in range(S):
        zj = z[j : j + 1]  # [1, R]
        after = (zj > z) | ((zj == z) & (j > row))
        next_z = jnp.where(after & (zj < next_z), zj, next_z)
    dists = jnp.where(next_z >= _FAR_SENTINEL, 1e10, next_z - z) * d_norm_row

    alpha = alpha_from_sigma(sigma, dists)
    one_minus = 1.0 - alpha + 1e-10
    trans = jnp.ones(z.shape, _ACC)
    for j in range(S):
        zj = z[j : j + 1]
        before = (zj < z) | ((zj == z) & (j < row))
        trans = trans * jnp.where(before, one_minus[j : j + 1], 1.0)
    return alpha * trans, alpha, dists


def finalize_maps(
    weights: jnp.ndarray,
    z: jnp.ndarray,
    rgb_sig: list[jnp.ndarray],
    white_bkgd: bool,
) -> list[jnp.ndarray]:
    """[r, g, b, disp, acc, depth] rows ([1, R] each) from weight planes.

    rgb_sig: three sigmoid-activated [S, R] channel planes.
    """
    acc_map = reduce0(weights)
    depth_map = reduce0(weights * z)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / (acc_map + 1e-10))
    chans = []
    for ch in rgb_sig:
        ch_map = reduce0(weights * ch)
        if white_bkgd:
            ch_map = ch_map + (1.0 - acc_map)
        chans.append(ch_map)
    return chans + [disp_map, acc_map, depth_map]


# ---------------------------------------------------------------------------
# in-kernel RNG (TPU only; interpret mode lacks prng_* lowering)
# ---------------------------------------------------------------------------


def uniform_01(shape) -> jnp.ndarray:
    """U(0, 1) floats from the per-core PRNG (call pltpu.prng_seed first).

    Mosaic has no uint32->float32 convert; use the exponent-stuffing
    bitcast instead: (bits >> 9) | 0x3f800000 reinterpreted as float32 is
    uniform in [1, 2) with 23 random mantissa bits. Offset by half a step
    so log() never sees exactly 0.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    f12 = pltpu.bitcast(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
    )
    return (f12 - 1.0) + 2.0**-24


def normal_rows(shape) -> jnp.ndarray:
    """Standard normals via Box-Muller from the per-core PRNG."""
    u1 = uniform_01(shape)
    u2 = uniform_01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * 3.14159265358979) * u2)
