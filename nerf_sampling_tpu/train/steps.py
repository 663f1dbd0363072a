"""Jitted training steps.

Parity target: reference Trainer.core_optimization_loop (Trainer.py:506-544).
The reference calls ``depth_net_loss.backward(retain_graph=True)`` then
``loss.backward()`` and steps ONLY the sampling optimizer — i.e. the depth
net receives the sum of both gradients and the (frozen) NeRF receives none.
In JAX that collapses to one differentiation of
``img_loss + mse(depth_z, stop_grad(max_z))`` w.r.t. the depth params only
(the hierarchical NeRF pass never touches depth params, so max_z needs no
explicit detach on this path — stop_gradient kept for clarity).

``make_nerf_train_step`` is the intended-but-broken vanilla path of the
reference (SURVEY.md §2 defect #4: its NeRF optimizer is created and decayed
but never stepped); here it trains coarse+fine for real so NeRFs can be
pretrained natively.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from nerf_sampling_tpu.core.compositing import raw2outputs
from nerf_sampling_tpu.core.metrics import img2mse, mse2psnr
from nerf_sampling_tpu.core.sampling import z_to_points
from nerf_sampling_tpu.models.depth_net import depth_net_apply
from nerf_sampling_tpu.render.engine import (
    NeRFParams,
    Pipeline,
    RayBatch,
    _query_fine_or_coarse,
    make_ray_batch,
    render_rays_joint,
    render_rays_train,
    render_rays_vanilla,
)
from nerf_sampling_tpu.train.state import TrainState


def _can_use_hier_oracle(p: Pipeline) -> bool:
    """The depth-net step's frozen-NeRF target pass can run as ONE fused
    stochastic hierarchical kernel when the config fits its envelope."""
    from nerf_sampling_tpu.kernels.fused_render import MAX_FUSED_SAMPLES

    return (
        p.mlp_impl in ("pallas", "pallas_int8")
        and p.use_viewdirs
        and not p.ndc
        and p.i_embed != -1
        and p.raw_noise_std == 0.0
        and 1 <= p.N_importance
        and 4 <= p.N_samples
        and p.N_samples + p.N_importance <= MAX_FUSED_SAMPLES
        and jax.default_backend() != "cpu"  # seeded kernel needs real PRNG
    )


def _unpack_batch(pipeline: Pipeline, batch) -> tuple[RayBatch, jnp.ndarray]:
    """Accept either a (RayBatch, target) pair or one packed [N, 9] array
    (rays_o | rays_d | rgb). The packed form makes a step a single
    host->device transfer — per-op dispatch latency through the remote
    axon tunnel dominates otherwise."""
    if isinstance(batch, tuple) and len(batch) == 2 and isinstance(batch[0], RayBatch):
        return batch
    rays = make_ray_batch(pipeline, batch[:, 0:3], batch[:, 3:6])
    return rays, batch[:, 6:9]


def _weighted_depth_loss(depth_z, max_z, acc, bg_weight: float):
    """Depth-MSE with background rays down-weighted (Pipeline
    bg_depth_loss_weight EXTENSION; bg_weight=1.0 reduces to the
    reference img2mse(depth_z, max_z) exactly — callers skip this
    function then so the parity path stays literally img2mse)."""
    fg = (acc.reshape(-1, 1) > 0.5).astype(depth_z.dtype)
    w = fg + bg_weight * (1.0 - fg)
    return jnp.mean(w * (depth_z - max_z) ** 2)


def _fg_bg_depth_diagnostics(depth_z, max_z, acc, thresh: float = 0.5):
    """Split the depth-loss into foreground/background components (metrics
    only — the OBJECTIVE stays reference-parity, Trainer.py:537-543).

    Background rays (hierarchical acc below ``thresh``) have near-zero
    density everywhere, so their argmax-weight depth target is sampling
    noise; this split measures how much of the logged depth loss that
    noise contributes — the working hypothesis for the eval-PSNR drift
    past ~10k iters (RESULTS.md)."""
    acc = acc.reshape(-1, 1)
    se = (depth_z - max_z) ** 2
    fg = (acc > thresh).astype(se.dtype)
    n_fg = jnp.sum(fg)
    n = jnp.asarray(se.shape[0], se.dtype)
    return {
        "depth_loss_fg": jnp.sum(se * fg) / jnp.maximum(n_fg, 1.0),
        "depth_loss_bg": jnp.sum(se * (1.0 - fg)) / jnp.maximum(n - n_fg, 1.0),
        "fg_frac": n_fg / n,
    }


def make_depth_net_train_step(
    pipeline: Pipeline,
    optimizer: optax.GradientTransformation,
    frozen_nerf: NeRFParams | None = None,
) -> Callable:
    """Build the jitted depth-net-only train step (frozen NeRF).

    With ``frozen_nerf`` given, the NeRF weights are closed over as
    compile-time constants and the returned step takes
    (depth_state, batch, key) — shaving the ~270-leaf argument processing
    (~30 ms/call host-side on the remote-tunneled backend) off every step.
    Without it, the step takes (nerf_params, depth_state, batch, key).
    """

    use_oracle = _can_use_hier_oracle(pipeline)

    def body(
        nerf_params: NeRFParams,
        depth_state: TrainState,
        batch,  # packed [N, 9] (rays_o|rays_d|rgb) or (RayBatch, target)
        key: jax.Array,
    ) -> tuple[TrainState, dict[str, jnp.ndarray]]:
        rays, target = _unpack_batch(pipeline, batch)

        if use_oracle:
            # The frozen-NeRF target pass (the step's 98% FLOP share: 64+128
            # stochastic hierarchical samples, reference nerf_utils.py:497-611
            # + argmax :689-691) carries no gradient w.r.t. depth params, so
            # it runs as ONE fused Pallas kernel — stratified jitter and CDF
            # randoms drawn on-core. Only the single depth-point query stays
            # on the differentiable XLA path below. With mlp_impl=
            # "pallas_int8" this no-gradient pass is exactly where the W8A8
            # kernels apply first (lowest numerics risk, ~98% of step FLOPs).
            from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier
            from nerf_sampling_tpu.render.engine import _quant_pair

            k_seed, k_noise = jax.random.split(key)
            p = pipeline
            qc, qf = _quant_pair(p, nerf_params)
            hm = fused_render_hier(
                nerf_params.coarse,
                p.nerf,
                nerf_params.fine,
                p.fine,
                rays.rays_o,
                rays.rays_d,
                n_coarse=p.N_samples,
                n_importance=p.N_importance,
                near=p.near,
                far=p.far,
                lindisp=p.lindisp,
                white_bkgd=p.white_bkgd,
                multires=p.multires,
                multires_views=p.multires_views,
                seed=jax.random.randint(k_seed, (), 0, 2**31 - 1, jnp.int32),
                quant=(qc, qf) if qc is not None else None,
            )
            max_z = jax.lax.stop_gradient(hm["max_z"].reshape(-1, 1))
            hier_acc = jax.lax.stop_gradient(hm["acc_map"].reshape(-1, 1))

            def loss_fn(depth_params: Any):
                depth_z = depth_net_apply(
                    depth_params, p.depth, rays.rays_o, rays.rays_d
                )
                depth_pts = z_to_points(rays.rays_o, rays.rays_d, depth_z)
                params = NeRFParams(nerf_params.coarse, nerf_params.fine, None)
                depth_raw = _query_fine_or_coarse(
                    p, params, depth_pts, rays, force_xla=True
                )
                out = raw2outputs(
                    depth_raw, depth_z, rays.rays_d, 0.0, p.white_bkgd,
                    key=k_noise,
                )
                img_loss = img2mse(out.rgb_map, target)
                if pipeline.bg_depth_loss_weight != 1.0:
                    depth_loss = _weighted_depth_loss(
                        depth_z, max_z, hier_acc,
                        pipeline.bg_depth_loss_weight,
                    )
                else:  # reference objective (Trainer.py:537-543)
                    depth_loss = img2mse(depth_z, max_z)
                diag = _fg_bg_depth_diagnostics(depth_z, max_z, hier_acc)
                return img_loss + depth_loss, (img_loss, depth_loss, diag)

        else:

            def loss_fn(depth_params: Any):
                params = NeRFParams(
                    nerf_params.coarse, nerf_params.fine, depth_params
                )
                out = render_rays_train(pipeline, params, rays, key)
                img_loss = img2mse(out["depth_net_rgb_map"], target)
                max_z = jax.lax.stop_gradient(out["max_z_vals"])
                acc = jax.lax.stop_gradient(out["acc_map"])
                if pipeline.bg_depth_loss_weight != 1.0:
                    depth_loss = _weighted_depth_loss(
                        out["depth_net_z_vals"], max_z, acc,
                        pipeline.bg_depth_loss_weight,
                    )
                else:  # reference objective (Trainer.py:537-543)
                    depth_loss = img2mse(out["depth_net_z_vals"], max_z)
                diag = _fg_bg_depth_diagnostics(
                    out["depth_net_z_vals"], max_z, acc,
                )
                return img_loss + depth_loss, (img_loss, depth_loss, diag)

        grads, (img_loss, depth_loss, diag) = jax.grad(loss_fn, has_aux=True)(
            depth_state.params
        )
        updates, opt_state = optimizer.update(
            grads, depth_state.opt_state, depth_state.params
        )
        new_params = optax.apply_updates(depth_state.params, updates)
        metrics = {
            "loss": img_loss,
            "depth_net_loss": depth_loss,
            "psnr": mse2psnr(img_loss),
            **diag,
        }
        return TrainState(depth_state.step + 1, new_params, opt_state), metrics

    if frozen_nerf is not None:
        const_nerf = jax.tree.map(jnp.asarray, frozen_nerf._replace(depth=None))

        def step(depth_state, batch, key):
            return body(const_nerf, depth_state, batch, key)

        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(body, donate_argnums=(1,))


def make_nerf_train_step(
    pipeline: Pipeline, optimizer: optax.GradientTransformation
) -> Callable:
    """Build the jitted vanilla hierarchical NeRF train step.

    Optimizes {coarse, fine} jointly with
    loss = img2mse(fine_rgb, target) + img2mse(coarse_rgb, target)
    (the standard NeRF objective the reference's machinery implies).

    mlp_impl="pallas" trains through the custom-VJP fused kernel
    (kernels/fused_nerf_vjp.py: bf16 matmuls, fp32 PE/accum, recompute
    backward); "xla" keeps the fp32 path. CPU falls back to xla — the
    interpret-mode kernels are only for correctness tests.
    """
    import dataclasses

    if pipeline.mlp_impl != "xla" and jax.default_backend() == "cpu":
        pipeline = dataclasses.replace(pipeline, mlp_impl="xla")

    def step(
        nerf_state: TrainState,  # params: NeRFParams(coarse, fine, depth=None)
        batch,  # packed [N, 9] (rays_o|rays_d|rgb) or (RayBatch, target)
        key: jax.Array,
    ) -> tuple[TrainState, dict[str, jnp.ndarray]]:
        rays, target = _unpack_batch(pipeline, batch)

        def loss_fn(params: NeRFParams):
            out = render_rays_vanilla(pipeline, params, rays, key)
            img_loss = img2mse(out["rgb_map"], target)
            img_loss0 = img2mse(out["rgb0"], target)
            return img_loss + img_loss0, (img_loss, img_loss0)

        grads, (img_loss, img_loss0) = jax.grad(loss_fn, has_aux=True)(
            nerf_state.params
        )
        updates, opt_state = optimizer.update(
            grads, nerf_state.opt_state, nerf_state.params
        )
        new_params = optax.apply_updates(nerf_state.params, updates)
        metrics = {
            "loss": img_loss + img_loss0,
            "img_loss": img_loss,
            "psnr": mse2psnr(img_loss),
            "psnr0": mse2psnr(img_loss0),
        }
        return TrainState(nerf_state.step + 1, new_params, opt_state), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_multi_step(
    step_fn: Callable, n_states: int = 1, with_const: bool = False,
    mesh=None,
) -> Callable:
    """Fuse many train steps into ONE dispatch via lax.scan.

    Per-step host dispatch through the remote-tunneled backend costs
    milliseconds — comparable to the 1024-ray step's compute — so the
    trainer batches ``K`` pre-sampled ray batches into a [K, N, 9] stack and
    runs them in one jitted scan. Per-step PRNG keys are derived inside
    (fold_in(base_key, i0 + j)), matching the single-step loop's stream
    exactly, so a scanned run is bit-identical to K sequential steps.

    step_fn: (state, batch, key) -> (state, metrics)            [n_states=1]
             (s1, s2, batch, key) -> (s1, s2, metrics)          [n_states=2]
             (const, state, batch, key) -> (state, metrics)     [with_const]
    Returns a jitted fn taking ([const,] states..., batches [K, ...],
    base_key, i0) and returning (states..., metrics stacked [K, ...]).

    ``with_const`` threads a loop-invariant pytree (e.g. the frozen NeRF of
    the depth-net step) through the scan as a regular argument: its
    host->device transfer and ~270-leaf argument processing amortize over
    the K fused steps, and — unlike closing the params over the trace as
    compile-time constants — the compiled program is checkpoint-independent,
    so switching NeRF checkpoints costs nothing (the frozen-constants
    single-step path pays a multi-minute remote recompile per checkpoint).

    ``mesh`` composes the scan with GSPMD data parallelism: the [K, N, ...]
    batch stack is sharded on its RAY axis (dim 1 — each scan iteration's
    rays split across devices), states/consts/keys replicated, and XLA
    emits the per-iteration psum gradient all-reduce inside the scan. One
    dispatch then covers K sharded steps — without this the ~30 ms
    dispatch round-trip the scan amortizes would return as the dominant
    cost on a real pod, where per-step compute is divided by the mesh size.
    Step math is unchanged, so scanned+sharded remains bit-identical to
    the per-step sharded loop.
    """

    def keys_for(base_key, i0, k):
        idx = jnp.arange(k, dtype=jnp.int32) + jnp.asarray(i0, jnp.int32)
        return jax.vmap(lambda j: jax.random.fold_in(base_key, j))(idx)

    def _jit(fn, n_leading_state_args, donate):
        if mesh is None:
            return jax.jit(fn, donate_argnums=donate)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        # Dim 1 (rays) shards over every mesh axis — ("rays",) on the 1-D
        # mesh, ("dcn", "rays") DCN-major on a hybrid multi-host mesh.
        stack_sh = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
        in_sh = (rep,) * n_leading_state_args + (stack_sh, rep, rep)
        out_states = (rep,) * (n_leading_state_args - (1 if with_const else 0))
        return jax.jit(
            fn,
            in_shardings=in_sh,
            out_shardings=out_states + (rep,),  # states... + metrics
            donate_argnums=donate,
        )

    if with_const:
        if n_states != 1:
            raise ValueError("with_const supports n_states=1 only")

        def multi_c(const, state, batches, base_key, i0):
            keys = keys_for(base_key, i0, batches.shape[0])

            def body(carry, xs):
                return step_fn(const, carry, xs[0], xs[1])

            return jax.lax.scan(body, state, (batches, keys))

        return _jit(multi_c, 2, donate=(1,))

    if n_states == 1:

        def multi(state, batches, base_key, i0):
            keys = keys_for(base_key, i0, batches.shape[0])

            def body(carry, xs):
                return step_fn(carry, xs[0], xs[1])

            return jax.lax.scan(body, state, (batches, keys))

        return _jit(multi, 1, donate=(0,))

    def multi2(s1, s2, batches, base_key, i0):
        keys = keys_for(base_key, i0, batches.shape[0])

        def body(carry, xs):
            a, b, m = step_fn(carry[0], carry[1], xs[0], xs[1])
            return (a, b), m

        (s1, s2), ms = jax.lax.scan(body, (s1, s2), (batches, keys))
        return s1, s2, ms

    return _jit(multi2, 2, donate=(0, 1))


def make_joint_train_step(
    pipeline: Pipeline,
    nerf_optimizer: optax.GradientTransformation,
    depth_optimizer: optax.GradientTransformation,
) -> Callable:
    """Build the jitted JOINT train step: NeRF and DepthNet both optimize.

    This is the capability the reference intended but never wired (its NeRF
    optimizer is created, lr-decayed, and checkpointed but never stepped —
    SURVEY.md §2 defect #4). Losses:

        nerf:  img2mse(fine_rgb, target) + img2mse(coarse_rgb, target)
               (+ the photometric term of the DepthNet render, whose
                gradient reaches the NeRF through the depth-point query)
        depth: img2mse(depth_rgb, target) + mse(depth_z, stop_grad(max_z))

    The step takes (nerf_state, depth_state, batch, key) and returns
    (new_nerf_state, new_depth_state, metrics). mlp_impl="pallas" trains
    through the custom-VJP fused kernel; CPU falls back to xla.
    """
    import dataclasses

    if pipeline.mlp_impl != "xla" and jax.default_backend() == "cpu":
        pipeline = dataclasses.replace(pipeline, mlp_impl="xla")

    def step(
        nerf_state: TrainState,  # params: NeRFParams(coarse, fine, None)
        depth_state: TrainState,  # params: depth pytree
        batch,
        key: jax.Array,
    ):
        rays, target = _unpack_batch(pipeline, batch)

        def loss_fn(nerf_params: NeRFParams, depth_params):
            params = nerf_params._replace(depth=depth_params)
            out = render_rays_joint(pipeline, params, rays, key)
            img_loss = img2mse(out["rgb_map"], target)
            img_loss0 = img2mse(out["rgb0"], target)
            depth_img_loss = img2mse(out["depth_net_rgb_map"], target)
            acc = jax.lax.stop_gradient(out["acc_map"])
            if pipeline.bg_depth_loss_weight != 1.0:  # same knob as depth mode
                depth_loss = _weighted_depth_loss(
                    out["depth_net_z_vals"], out["max_z_vals"], acc,
                    pipeline.bg_depth_loss_weight,
                )
            else:  # reference objective
                depth_loss = img2mse(out["depth_net_z_vals"], out["max_z_vals"])
            diag = _fg_bg_depth_diagnostics(
                out["depth_net_z_vals"], out["max_z_vals"], acc
            )
            total = img_loss + img_loss0 + depth_img_loss + depth_loss
            if pipeline.joint_depth_warmup:
                # warmup: only the pure-NeRF photometric terms drive grads
                # (the depth terms of a random NeRF are argmax noise that
                # collapses the depth net — see Pipeline.joint_depth_warmup)
                live = (
                    nerf_state.step >= pipeline.joint_depth_warmup
                ).astype(img_loss.dtype)
                total = img_loss + img_loss0 + live * (
                    depth_img_loss + depth_loss
                )
            return total, (img_loss, depth_img_loss, depth_loss, diag)

        (ng, dg), aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            nerf_state.params, depth_state.params
        )
        img_loss, depth_img_loss, depth_loss, diag = aux

        nu, n_opt = nerf_optimizer.update(ng, nerf_state.opt_state, nerf_state.params)
        new_nerf = optax.apply_updates(nerf_state.params, nu)
        du, d_opt = depth_optimizer.update(dg, depth_state.opt_state, depth_state.params)
        new_depth = optax.apply_updates(depth_state.params, du)
        if pipeline.joint_depth_warmup:
            # hold the depth net's params AND optimizer state exactly frozen
            # during warmup (zero grads alone would still decay Adam moments
            # and advance its bias-correction count)
            live_b = nerf_state.step >= pipeline.joint_depth_warmup
            new_depth = jax.tree.map(
                lambda n, o: jnp.where(live_b, n, o),
                new_depth, depth_state.params,
            )
            d_opt = jax.tree.map(
                lambda n, o: jnp.where(live_b, n, o),
                d_opt, depth_state.opt_state,
            )

        metrics = {
            "loss": img_loss + depth_img_loss,
            "img_loss": img_loss,
            "depth_net_loss": depth_loss,
            "psnr": mse2psnr(img_loss),
            **diag,
        }
        if pipeline.joint_depth_warmup:
            # expose the warmup gate so logs can tell a frozen depth net
            # from a training one (the loss terms above are the UNGATED
            # values — a flat depth_net_loss during warmup is expected,
            # not a collapse)
            metrics["depth_live"] = (
                nerf_state.step >= pipeline.joint_depth_warmup
            ).astype(img_loss.dtype)
        return (
            TrainState(nerf_state.step + 1, new_nerf, n_opt),
            TrainState(depth_state.step + 1, new_depth, d_opt),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0, 1))
