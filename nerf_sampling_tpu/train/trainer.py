"""Training orchestration.

Functional replacement for the reference's 806-line template-method Trainer
(trainers/Trainer.py): data loading, model/optimizer setup, checkpoint
restore, the train loop, periodic eval/ckpt/video, and the render-only path.
The per-step compute is one jitted function (steps.py); everything here is
host-side orchestration.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.core.metrics import to8b
from nerf_sampling_tpu.data.types import SceneData
from nerf_sampling_tpu.render.engine import EvalMode, NeRFParams, Pipeline
from nerf_sampling_tpu.render.path import render_path
from nerf_sampling_tpu.models import depth_net_init, nerf_init
from nerf_sampling_tpu.train import checkpoint as ckpt_lib
from nerf_sampling_tpu.train.sampler import RaySampler, SamplerConfig
from nerf_sampling_tpu.train.state import (
    TrainState,
    init_state,
    make_depth_optimizer,
    make_nerf_optimizer,
)
from nerf_sampling_tpu.train.steps import (
    make_depth_net_train_step,
    make_joint_train_step,
    make_multi_step,
    make_nerf_train_step,
)
from nerf_sampling_tpu.utils.config import TrainerConfig
from nerf_sampling_tpu.utils.logging import MetricsLogger


class TrialPruned(Exception):
    """Raised by the HPO pruning hook when optuna itself is unavailable
    (optuna's own TrialPruned is raised when it is installed)."""


def _enable_compilation_cache() -> None:
    """Persist compiled executables across processes.

    The remote AOT compile of the full train step takes minutes on the axon
    backend; the on-disk cache makes relaunches near-instant. Best-effort —
    older jax versions or exotic backends may not support it.

    CPU backends are excluded: XLA:CPU cache entries are AOT-compiled
    against the build host's exact CPU features, so a workspace that moves
    hosts turns every cache hit into a cpu_aot_loader error (and a SIGILL
    risk) — and CPU compiles are fast enough to not need the cache.
    """
    import os

    try:
        if jax.default_backend() == "cpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover
        print(f"[trainer] compilation cache unavailable: {e}")


class Trainer:
    """Drives depth-net training (frozen NeRF) or vanilla NeRF pretraining."""

    def __init__(self, cfg: TrainerConfig, trial: Any = None):
        self.cfg = cfg
        self.trial = trial  # optuna trial (optional, for HPO pruning)
        self.global_step = 0
        self.start = 0
        self.mesh = None  # set by _setup_mesh() when n_devices > 1
        self.scene: SceneData | None = None
        self.pipeline: Pipeline | None = None
        self.params: NeRFParams | None = None
        self.logger: MetricsLogger | None = None
        self._avg_eval_psnr = 0.0
        self._best_psnr = -float("inf")
        self._evals_since_best = 0
        self._stop_early = False

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    @property
    def expdir(self) -> str:
        return os.path.join(self.cfg.basedir, self.cfg.expname)

    @property
    def primary(self) -> bool:
        """True on the process that owns all filesystem/wandb writes.

        Multi-process runs (jax.distributed) construct the same Trainer on
        every host; checkpoints, logs, PNGs and psnr.txt must be written
        exactly once (the experiment dir is shared on a pod). Eval renders
        and keep_best/early-stop DECISIONS still run on every process —
        they consume allgathered, process-identical values — so control
        flow never diverges across hosts.
        """
        return jax.process_index() == 0

    def load_data(self) -> SceneData:
        """Dispatch on dataset_type (reference per-dataset trainers)."""
        cfg = self.cfg
        if cfg.dataset_type == "blender":
            from nerf_sampling_tpu.data.blender import load_blender_data

            scene = load_blender_data(cfg.datadir, cfg.half_res, cfg.testskip)
            if cfg.white_bkgd:
                scene.composite_white_background()
            else:
                scene.drop_alpha()
            scene.near, scene.far = cfg.near, cfg.far
        elif cfg.dataset_type == "llff":
            from nerf_sampling_tpu.data.llff import load_llff_scene

            scene = load_llff_scene(cfg)
        elif cfg.dataset_type == "LINEMOD":
            from nerf_sampling_tpu.data.linemod import load_linemod_scene

            scene = load_linemod_scene(cfg)
        elif cfg.dataset_type == "deepvoxels":
            from nerf_sampling_tpu.data.deepvoxels import load_deepvoxels_scene

            scene = load_deepvoxels_scene(cfg)
        else:
            raise ValueError(f"unknown dataset_type {cfg.dataset_type}")
        return scene

    def create_log_dir_and_dump_config(self) -> None:
        """args.txt + config copy (reference Trainer.py:148-160).

        Process 0 only: on a pod the experiment dir is shared storage."""
        if not self.primary:
            return
        os.makedirs(self.expdir, exist_ok=True)
        with open(os.path.join(self.expdir, "args.txt"), "w") as f:
            for k, v in dataclasses.asdict(self.cfg).items():
                f.write(f"{k} = {v}\n")
        if self.cfg.config_path is not None and os.path.exists(self.cfg.config_path):
            with open(self.cfg.config_path) as src, open(
                os.path.join(self.expdir, "config.txt"), "w"
            ) as dst:
                dst.write(src.read())

    def _init_params(self) -> NeRFParams:
        cfg, p = self.cfg, self.pipeline
        key = jax.random.PRNGKey(cfg.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        return NeRFParams(
            coarse=nerf_init(k1, p.nerf),
            fine=nerf_init(k2, p.fine) if p.fine is not None else None,
            depth=depth_net_init(k3, p.depth) if p.depth is not None else None,
        )

    def setup_models(self) -> None:
        cfg = self.cfg
        with_depth = cfg.train_mode in ("depth_net", "joint")
        self.pipeline = cfg.pipeline(with_depth=with_depth)
        if self.pipeline.ndc and self.scene is not None:
            # training steps see only flat ray batches — the NDC
            # reprojection's H/W/focal must ride on the pipeline
            H, W, focal = self.scene.hwf
            self.pipeline = dataclasses.replace(
                self.pipeline, H=int(H), W=int(W), focal=float(focal)
            )
        params = self._init_params()
        self._resume_ckpt_path: str | None = None
        self._depth_state = None  # live joint-mode depth TrainState (for ckpt)

        # --- NeRF restore (reference nerf_utils.py:451-467: ft_path or newest)
        nerf_ckpts = (
            [cfg.ft_path]
            if cfg.ft_path not in (None, "None")
            else ckpt_lib.find_checkpoints(self.expdir, r"^(?!depth_).*\.(npz|tar)$")
        )
        nerf_start = 0
        if nerf_ckpts and not cfg.no_reload and os.path.exists(nerf_ckpts[-1]):
            path = nerf_ckpts[-1]
            print(f"Reloading NeRF from {path}")
            if path.endswith(".tar"):
                data = ckpt_lib.import_torch_checkpoint(path)
                params = params._replace(
                    coarse=data["nerf_coarse"],
                    fine=data.get("nerf_fine") or params.fine,
                )
                if data.get("depth") and with_depth and cfg.depth_net_path is None:
                    params = params._replace(depth=data["depth"])
                nerf_start = data["global_step"]
            else:
                tree, nerf_start = ckpt_lib.load_checkpoint(
                    path,
                    {"params": NeRFParams(params.coarse, params.fine, None)},
                )
                params = params._replace(
                    coarse=tree["params"].coarse, fine=tree["params"].fine
                )
                # Joint-mode checkpoints carry the depth net in the same
                # (non-depth_-prefixed) file; a joint resume must restore it
                # or the depth net silently restarts from init.
                if (
                    with_depth
                    and cfg.depth_net_path in (None, "None")
                    and params.depth is not None
                ):
                    try:
                        dtree, _ = ckpt_lib.load_checkpoint(
                            path, {"params": NeRFParams(None, None, params.depth)}
                        )
                        params = params._replace(depth=dtree["params"].depth)
                        print(f"Reloading DepthNet from {path} (joint checkpoint)")
                    except KeyError:
                        pass  # NeRF-only pretrain: keep the fresh depth init
                if cfg.train_mode in ("nerf", "joint"):
                    self._resume_ckpt_path = path

        # --- DepthNet restore (reference sampling_trainer.py:82-108)
        depth_start = None
        if with_depth:
            depth_ckpts = (
                [cfg.depth_net_path]
                if cfg.depth_net_path not in (None, "None")
                else ckpt_lib.find_checkpoints(self.expdir, r"^depth_.*\.npz$")
            )
            if depth_ckpts and not cfg.no_reload and os.path.exists(depth_ckpts[-1]):
                path = depth_ckpts[-1]
                print(f"Reloading DepthNet from {path}")
                if path.endswith(".tar"):
                    data = ckpt_lib.import_torch_checkpoint(path)
                    if data.get("depth"):
                        params = params._replace(depth=data["depth"])
                    depth_start = data["global_step"]
                else:
                    tree, depth_start = ckpt_lib.load_checkpoint(
                        path, {"params": params}
                    )
                    params = params._replace(depth=tree["params"].depth)
                    self._resume_ckpt_path = path

        self.params = params
        if self.pipeline.mlp_impl == "pallas_int8" and self.scene is not None:
            if cfg.train_mode in ("nerf", "joint") and not cfg.render_only:
                # Calibration is a one-shot over the params restored HERE;
                # these modes then update the NeRF for thousands of steps,
                # so every periodic i_testset eval (which drives keep_best /
                # early stopping) would render through increasingly stale
                # activation scales and could silently select the wrong
                # 'best' checkpoint. int8 is only valid where the NeRF is
                # frozen: the depth_net-mode oracle and render-only paths.
                raise ValueError(
                    "mlp_impl='pallas_int8' requires a frozen NeRF (its "
                    "activation calibration is per-checkpoint); train_mode="
                    f"'{cfg.train_mode}' updates the NeRF. Use mlp_impl="
                    "'pallas' for nerf/joint training; int8 is for "
                    "depth_net training and render-only evaluation."
                )
            # int8 eval kernels need a per-checkpoint calibration; the
            # frozen NeRF just restored is exactly what the depth-train
            # oracle / eval renders will query
            from nerf_sampling_tpu.render.quantize import calibrate_pipeline

            self.pipeline = calibrate_pipeline(self.pipeline, params, self.scene)
        if cfg.train_mode == "depth_net":
            self.start = depth_start if depth_start is not None else 0
        else:
            self.start = nerf_start
        self.global_step = self.start

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def _setup_mesh(self):
        """Build the device mesh when multi-chip is requested (n_devices).

        The production scale-out path: training data-parallels the ray
        batch with replicated params (XLA emits the psum grad all-reduce
        over ICI); rendering shard_maps the same per-ray code. Returns None
        for the single-device case.
        """
        cfg = self.cfg
        from nerf_sampling_tpu.parallel import (
            make_hybrid_mesh,
            make_mesh,
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(cfg)
        total = jax.device_count()
        n = cfg.n_devices if cfg.n_devices != 0 else total
        if jax.process_count() > 1:
            # Multi-process: every host must participate in one global mesh,
            # laid out hierarchically ([dcn, rays]: one row per host, the
            # rays axis ICI-local) so the gradient all-reduce decomposes
            # into a fast in-host phase + one small cross-host DCN phase.
            if n != total:
                raise ValueError(
                    f"multi-process training uses ALL global devices: "
                    f"n_devices={cfg.n_devices} but the {jax.process_count()}"
                    f"-process cluster exposes {total} (set n_devices=0)"
                )
            if self.primary:
                print(
                    f"[trainer] multi-host data-parallel: "
                    f"{jax.process_count()} processes x "
                    f"{len(jax.local_devices())} devices (hybrid [dcn, rays] mesh)"
                )
            return make_hybrid_mesh()
        if n <= 1:
            return None
        devices = jax.devices()[:n]
        if len(devices) < n:
            raise ValueError(
                f"n_devices={n} but only {jax.device_count()} devices present"
            )
        print(f"[trainer] data-parallel over {n} devices")
        return make_mesh(devices)

    def _shard_batch(self, batch: np.ndarray, sharding) -> jax.Array:
        """Place a host batch onto the mesh with its RAY dim sharded.

        Single-process: plain device_put. Multi-process: each host
        contributes only its own contiguous row block through
        ``jax.make_array_from_process_local_data`` — the pod batch-feed
        pattern (a host only ever touches the rows its devices will hold;
        here every host *derives* the identical global batch from the
        shared sampler stream and slices out its share). Row contiguity per
        process holds on both mesh shapes because ray_sharding is DCN-major
        on the hybrid mesh (parallel/mesh.py).

        The ray dim is the leading one except for the scanned path's
        [K, N, C] stack, where it is dim 1 — inferred from the sharding
        spec so both call sites share this helper.
        """
        nproc = jax.process_count()
        if nproc == 1:
            return jax.device_put(batch, sharding)
        spec = sharding.spec
        ray_dim = next(i for i, s in enumerate(spec) if s is not None)
        n = batch.shape[ray_dim]
        # Divisibility must hold at SHARD granularity (every device gets an
        # equal ray block), not just per process — n % nproc == 0 alone
        # would fail later inside make_array_from_process_local_data with
        # an opaque shape error.
        n_shards = nproc * len(jax.local_devices())
        if n % n_shards:
            raise ValueError(
                f"ray batch of {n} rows not divisible into {n_shards} "
                f"shards ({nproc} processes x "
                f"{len(jax.local_devices())} devices each)"
            )
        rows = n // nproc
        lo = jax.process_index() * rows
        idx = tuple(
            slice(lo, lo + rows) if d == ray_dim else slice(None)
            for d in range(batch.ndim)
        )
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(batch[idx]), global_shape=batch.shape
        )

    def train(self, N_iters: int = 200001) -> float:
        cfg = self.cfg
        # Mesh (and therefore jax.distributed.initialize for --multihost)
        # MUST come before the compilation-cache setup: _enable_compilation
        # _cache calls jax.default_backend(), which initializes the XLA
        # backend, and jax.distributed.initialize raises RuntimeError once
        # the backend exists. The multihost smoke worker pre-initializes in
        # its own main(), which masked this ordering on the cluster tests.
        self.mesh = self._setup_mesh()
        _enable_compilation_cache()
        self.scene = self.load_data()
        self.create_log_dir_and_dump_config()
        self.setup_models()
        self.logger = MetricsLogger(
            self.expdir, cfg.wandb_mode, cfg, enabled=self.primary
        )

        if cfg.render_only:
            return self.render_only_path()

        sampler = RaySampler(
            self.scene,
            SamplerConfig(
                N_rand=cfg.N_rand,
                use_batching=not cfg.no_batching,
                precrop_iters=cfg.precrop_iters,
                precrop_frac=cfg.precrop_frac,
                single_image=cfg.single_image,
                single_ray=cfg.single_ray,
            ),
            seed=cfg.seed,
        )

        n_scan = self._resolve_scan_steps(N_iters)
        depth_state = None
        # When the scan is active it wraps the UNSHARDED per-step fns — the
        # mesh shardings are applied at the scan level (make_multi_step
        # mesh=...), so scan-fused dispatch and data parallelism compose.
        scanned = n_scan > 1
        if cfg.train_mode == "depth_net":
            optimizer = make_depth_optimizer(cfg.depth_net_lr)
            state = init_state(self.params.depth, optimizer, self.start)
            if scanned:
                # frozen NeRF rides as a loop-invariant ARGUMENT (processed
                # once per K-step dispatch, replicated once under a mesh),
                # so the compiled program is checkpoint-independent — no
                # multi-minute recompile when the NeRF checkpoint changes
                step_fn = make_depth_net_train_step(self.pipeline, optimizer)
            elif self.mesh is not None:  # per-step sharded loop
                from nerf_sampling_tpu.parallel import (
                    make_sharded_depth_train_step,
                )

                step_fn = make_sharded_depth_train_step(
                    self.pipeline, optimizer, self.mesh
                )
            else:
                step_fn = make_depth_net_train_step(
                    self.pipeline, optimizer, frozen_nerf=self.params
                )
        elif cfg.train_mode == "joint":
            optimizer = make_nerf_optimizer(cfg.lrate, cfg.lrate_decay)
            depth_opt = make_depth_optimizer(cfg.depth_net_lr)
            state = init_state(self.params._replace(depth=None), optimizer, self.start)
            depth_state = init_state(self.params.depth, depth_opt, self.start)
            if self.mesh is not None and not scanned:
                from nerf_sampling_tpu.parallel import make_sharded_joint_train_step

                step_fn = make_sharded_joint_train_step(
                    self.pipeline, optimizer, depth_opt, self.mesh
                )
            else:
                step_fn = make_joint_train_step(self.pipeline, optimizer, depth_opt)
        else:
            optimizer = make_nerf_optimizer(cfg.lrate, cfg.lrate_decay)
            state = init_state(
                self.params._replace(depth=None), optimizer, self.start
            )
            if self.mesh is not None and not scanned:
                from nerf_sampling_tpu.parallel import make_sharded_nerf_train_step

                step_fn = make_sharded_nerf_train_step(
                    self.pipeline, optimizer, self.mesh
                )
            else:
                step_fn = make_nerf_train_step(self.pipeline, optimizer)

        # Exact-resume: restore optimizer moments when the newest native
        # checkpoint matches this train mode.
        if self._resume_ckpt_path is not None:
            try:
                restored, _ = ckpt_lib.load_checkpoint(
                    self._resume_ckpt_path, {"opt_state": state.opt_state}
                )
                state = state._replace(opt_state=restored["opt_state"])
                print(f"Restored optimizer state from {self._resume_ckpt_path}")
            except KeyError:
                pass
            if depth_state is not None:
                try:
                    restored, _ = ckpt_lib.load_checkpoint(
                        self._resume_ckpt_path,
                        {"depth_opt_state": depth_state.opt_state},
                    )
                    depth_state = depth_state._replace(
                        opt_state=restored["depth_opt_state"]
                    )
                    print(
                        "Restored depth optimizer state from "
                        f"{self._resume_ckpt_path}"
                    )
                except KeyError:
                    pass  # pre-fix or NeRF-only ckpt: fresh depth moments

        if cfg.debug_nans:
            from nerf_sampling_tpu.utils.profiling import enable_nan_debugging

            enable_nan_debugging()

        from nerf_sampling_tpu.utils.profiling import StepTimer, trace

        timer = StepTimer(rays_per_step=cfg.N_rand)
        base_key = jax.random.PRNGKey(cfg.seed)
        metrics: dict[str, Any] = {}
        from tqdm import trange

        # The frozen-NeRF bundle passed to the depth step every iteration.
        # Never alias the live optimizer state into it: the step donates its
        # state buffers, and passing the same buffer as both a donated and a
        # regular argument wedges the axon runtime.
        frozen_nerf = self.params._replace(depth=None)

        ray_shd = None
        if self.mesh is not None:
            from nerf_sampling_tpu.parallel import ray_sharding, replicated_sharding

            ray_shd = ray_sharding(self.mesh)
            # replicate the frozen NeRF once; the sharded depth step takes it
            # as an explicit (non-donated) argument. Through host numpy on a
            # multi-process mesh: a committed single-device array cannot be
            # auto-resharded onto non-addressable devices, but every process
            # holds the identical full value (same checkpoint / same init
            # key), so replication needs no communication.
            if jax.process_count() > 1:
                frozen_nerf = jax.tree.map(
                    lambda x: None if x is None else np.asarray(x), frozen_nerf
                )
            frozen_nerf = jax.device_put(
                frozen_nerf, replicated_sharding(self.mesh)
            )

        if n_scan > 1:
            return self._train_scanned(
                step_fn, state, depth_state, sampler, base_key, N_iters,
                timer, frozen_nerf, n_scan,
            )

        for i in trange(self.start + 1, N_iters):
            if cfg.profile_dir is not None and i == self.start + 20:
                profiler_cm = trace(cfg.profile_dir)
                profiler_cm.__enter__()
            ro, rd, target = sampler.sample(i)
            # one packed host->device transfer; rays are unpacked inside the
            # jitted step (per-op dispatch latency through the axon tunnel
            # made host-side make_ray_batch cost ~200 ms/iter)
            batch = np.concatenate([ro, rd, target], -1)
            if ray_shd is not None:
                batch = self._shard_batch(batch, ray_shd)
            key = jax.random.fold_in(base_key, i)
            if cfg.train_mode == "depth_net":
                if self.mesh is not None:
                    state, metrics = step_fn(frozen_nerf, state, batch, key)
                else:
                    state, metrics = step_fn(state, batch, key)
                self.params = frozen_nerf._replace(depth=state.params)
            elif cfg.train_mode == "joint":
                state, depth_state, metrics = step_fn(state, depth_state, batch, key)
                self.params = state.params._replace(depth=depth_state.params)
                self._depth_state = depth_state
            else:
                state, metrics = step_fn(state, batch, key)
                self.params = state.params._replace(depth=None)
            timer.tick()
            # Bound the async dispatch queue: the axon tunnel degrades badly
            # with hundreds of queued steps (observed multi-minute stalls).
            # A scalar host read every 32 steps keeps the queue shallow at
            # negligible cost (block_until_ready alone does NOT drain here).
            if i % 32 == 0:
                float(metrics["loss"])
            if cfg.profile_dir is not None and i == self.start + 40:
                jax.block_until_ready(jax.tree.leaves(state.params)[0])
                profiler_cm.__exit__(None, None, None)
                print(f"profiler trace written to {cfg.profile_dir}")
            self.global_step = i
            self.log(i, metrics, state, timer)
            if self._stop_early:
                break

        final = metrics.get("psnr")
        return float(final) if final is not None else 0.0

    def _resolve_scan_steps(self, N_iters: int) -> int:
        """Steps fused per dispatch (cfg.steps_per_dispatch; 0 = auto).

        Auto picks the largest divisor of every logging cadence that is
        <= 100, so chunk boundaries land exactly on i_print/i_weights/
        i_testset/i_video multiples and log() sees the state it would have
        seen in the single-step loop. The cap is measured, not guessed:
        at the default cadences the sustained REAL-Trainer depth-train rate
        is 155 it/s at K=25, 226 at K=50, and 250 at K=100 — the last
        matching the pure step benchmark, i.e. at K=100 the host-side
        pixel sampling and per-chunk metrics read are fully hidden behind
        the device (scripts/bench_sustained.py; one chunk is still a
        single dispatch, so the async queue stays shallow). Composes with
        the mesh (the scan is jitted with the batch stack sharded on rays
        — make_multi_step). Stays at 1 on cpu (no dispatch latency to
        amortize), when profiling (per-step trace), and for runs shorter
        than one chunk.
        """
        import math

        cfg = self.cfg
        if cfg.profile_dir is not None or N_iters - self.start <= 2:
            return 1
        if cfg.steps_per_dispatch >= 1:  # explicit setting wins (any backend)
            # ... but a chunk size that doesn't divide the logging cadences
            # would hand log() END-of-chunk state at mid-chunk steps: a
            # checkpoint labeled step m would hold params from step m+delta
            # and resume from it would re-train applied steps. Round down to
            # the largest divisor of gcd(cadences) instead.
            g = math.gcd(
                math.gcd(cfg.i_print, cfg.i_weights),
                math.gcd(cfg.i_testset, cfg.i_video),
            )
            n = cfg.steps_per_dispatch
            while g % n != 0:
                n -= 1
            if n != cfg.steps_per_dispatch:
                print(
                    f"[trainer] steps_per_dispatch={cfg.steps_per_dispatch} "
                    f"does not divide the logging cadences (gcd {g}); "
                    f"using {n} so checkpoints/logs stay step-exact"
                )
            return n
        if jax.default_backend() == "cpu":
            return 1
        g = math.gcd(
            math.gcd(cfg.i_print, cfg.i_weights),
            math.gcd(cfg.i_testset, cfg.i_video),
        )
        best = 1
        for k in range(2, min(g, 100) + 1):
            if g % k == 0:
                best = k
        return best

    def _train_scanned(
        self, step_fn, state, depth_state, sampler, base_key, N_iters,
        timer, frozen_nerf, n_scan,
    ) -> float:
        """The train loop with n_scan steps fused per dispatch.

        Bit-identical to the single-step loop (same per-step fold_in keys,
        same sampler stream); the chunk's stacked metrics are read back once
        per dispatch, which also bounds the async queue (RESULTS.md: deep
        dispatch queues stall the axon tunnel).
        """
        cfg = self.cfg
        mode = cfg.train_mode
        depth_mode = mode == "depth_net"
        multi = make_multi_step(
            step_fn,
            n_states=2 if mode == "joint" else 1,
            with_const=depth_mode,
            mesh=self.mesh,  # scan + GSPMD compose (batch sharded on rays)
        )
        if depth_mode:
            # ship the frozen NeRF once; the same committed buffers are
            # passed every dispatch (no per-chunk retransfer)
            frozen_nerf = jax.tree.map(jnp.asarray, frozen_nerf)
        from tqdm import tqdm

        metrics: dict[str, Any] = {}
        pbar = tqdm(total=N_iters - 1 - self.start)

        stack_shd = None
        if self.mesh is not None and jax.process_count() > 1:
            # multi-process: feed each host's row block explicitly (the same
            # make_array_from_process_local_data path as the per-step loop);
            # dim 1 of the [K, N, C] stack is the ray axis (make_multi_step)
            from jax.sharding import NamedSharding, PartitionSpec as P

            stack_shd = NamedSharding(
                self.mesh, P(None, tuple(self.mesh.axis_names))
            )

        def build_stack(i0: int, k: int) -> np.ndarray:
            stack = np.stack(
                [np.concatenate(sampler.sample(i0 + j), -1) for j in range(k)]
            )
            if stack_shd is not None:
                return self._shard_batch(stack, stack_shd)
            return stack

        i = self.start + 1
        k = min(n_scan, N_iters - i)
        stack = build_stack(i, k)
        while i < N_iters and not self._stop_early:
            if mode == "joint":
                state, depth_state, ms = multi(state, depth_state, stack, base_key, i)
                self.params = state.params._replace(depth=depth_state.params)
                self._depth_state = depth_state
            elif depth_mode:
                state, ms = multi(frozen_nerf, state, stack, base_key, i)
                self.params = frozen_nerf._replace(depth=state.params)
            else:
                state, ms = multi(state, stack, base_key, i)
                self.params = state.params._replace(depth=None)
            # sample the NEXT chunk before the metrics read: the host-side
            # pixel sampling overlaps the device's async execution of this
            # chunk instead of adding to the critical path
            k_next = min(n_scan, N_iters - (i + k))
            if k_next > 0:
                stack = build_stack(i + k, k_next)
            ms_host = jax.device_get(ms)
            for j in range(k):
                timer.tick()
                self.global_step = i + j
                metrics = {kk: vv[j] for kk, vv in ms_host.items()}
                self.log(i + j, metrics, state, timer)
                if self._stop_early:
                    break
            pbar.update(k)
            i += k
            k = k_next
        pbar.close()
        final = metrics.get("psnr")
        return float(final) if final is not None else 0.0

    # ------------------------------------------------------------------
    # logging / eval / checkpoints (reference Trainer.log, :271-398)
    # ------------------------------------------------------------------

    def _eval_mode(self) -> EvalMode:
        cfg = self.cfg
        if cfg.use_nerf_max_pts:
            return EvalMode.NERF_MAX
        if cfg.use_full_nerf or cfg.train_mode == "nerf":
            return EvalMode.FULL_NERF
        if cfg.compare_nerf:
            return EvalMode.COMPARE_NERF
        return EvalMode.DEPTH_NET

    def log(self, i: int, metrics: dict, state: TrainState, timer=None) -> None:
        cfg = self.cfg
        scene = self.scene

        if i % cfg.i_weights == 0:
            self.save_checkpoint(i, state)

        if i % cfg.i_testset == 0 and i > 0 and len(scene.i_test) > 0:
            # Multi-process: the sharded render below is a GLOBAL SPMD
            # program — every process must execute it — and its maps come
            # back allgathered and process-identical, so the PSNR (and the
            # keep_best / early-stop decisions derived from it) agree across
            # hosts without any extra synchronization. Only the artifact
            # writes (PNGs, psnr.txt, checkpoints) are primary-gated.
            testsavedir = None
            if self.primary:
                testsavedir = os.path.join(self.expdir, f"testset_{i:06d}")
                os.makedirs(testsavedir, exist_ok=True)
            _, _, avg_psnr = render_path(
                self.pipeline,
                self.params,
                scene.poses[scene.i_test],
                scene.hwf,
                scene.intrinsics(),
                jax.random.PRNGKey(0),
                mode=self._eval_mode(),
                chunk=cfg.chunk,
                gt_imgs=scene.images[scene.i_test],
                savedir=testsavedir,
                logger=self.logger,
                verbose=False,
                mesh=self.mesh,
            )
            self._avg_eval_psnr = avg_psnr
            self.logger.log({"test_psnr": avg_psnr}, i)
            if self.primary:
                print(f"Saved test set (avg PSNR {avg_psnr:.3f})")
            # best-checkpoint selection / early stop on eval PSNR
            if avg_psnr > self._best_psnr + 1e-6:
                self._best_psnr = avg_psnr
                self._evals_since_best = 0
                if cfg.keep_best:
                    self.save_checkpoint(i, state, subdir="best")
            else:
                self._evals_since_best += 1
                if (
                    cfg.early_stop_patience > 0
                    and self._evals_since_best >= cfg.early_stop_patience
                ):
                    print(
                        f"Early stop at iter {i}: eval PSNR has not improved "
                        f"for {self._evals_since_best} evals "
                        f"(best {self._best_psnr:.3f})"
                    )
                    self._stop_early = True
            if cfg.save_train_set_render:
                trainsavedir = None
                if self.primary:
                    trainsavedir = os.path.join(self.expdir, f"trainset_{i:06d}")
                    os.makedirs(trainsavedir, exist_ok=True)
                render_path(
                    self.pipeline,
                    self.params,
                    scene.poses[scene.i_train[:10]],
                    scene.hwf,
                    scene.intrinsics(),
                    jax.random.PRNGKey(0),
                    mode=self._eval_mode(),
                    chunk=cfg.chunk,
                    savedir=trainsavedir,
                    verbose=False,
                    mesh=self.mesh,
                )

        if i % cfg.i_video == 0 and i > 0:
            self.save_spiral_video(i)

        if i % cfg.i_print == 0:
            loss = float(metrics.get("loss", np.nan))
            psnr = float(metrics.get("psnr", np.nan))
            info = f"Iter: {i} Loss: {loss}"
            scalars = {"Loss": loss, "Depth net PSNR": psnr}
            # only print metrics the mode actually produces: nerf-mode steps
            # emit no depth loss, and a hardcoded "Depth Net Loss: nan" line
            # reads as a failure in the artifacts
            if "depth_net_loss" in metrics:
                dn_loss = float(metrics["depth_net_loss"])
                info += f", Depth Net Loss: {dn_loss}"
                scalars["Depth net loss"] = dn_loss
            for k in ("depth_loss_fg", "depth_loss_bg", "fg_frac",
                      "depth_live"):
                if k in metrics:
                    scalars[k] = float(metrics[k])
            info += f", PSNR: {psnr:.5f}"
            if timer is not None:
                scalars.update(timer.metrics())
            self.logger.log(scalars, i)
            if self.primary:
                print(info)
                with open(os.path.join(self.expdir, "psnr.txt"), "a") as f:
                    f.write(f"{info}\n")
            if self.trial is not None:
                self._report_trial(psnr, i)

    def _report_trial(self, psnr: float, step: int) -> None:
        """optuna pruning hook (reference Trainer.py:393-398).

        Works with any trial-shaped object exposing report/should_prune —
        optuna's Trial in a real study, or a stub in tests (optuna is
        optional in this environment). Raises optuna's TrialPruned when
        available so study.optimize records the prune; otherwise the local
        TrialPruned subclass.
        """
        self.trial.report(psnr, step)
        if self.trial.should_prune():
            try:
                import optuna

                exc = optuna.exceptions.TrialPruned
            except ImportError:
                exc = TrialPruned
            raise exc()

    def save_checkpoint(self, i: int, state: TrainState, subdir: str = "") -> None:
        """subdir="best" writes the keep_best snapshot out of the resume
        scan's way (setup_models picks the newest ckpt in expdir itself).

        Process 0 only: params/opt_state are replicated, so its local shards
        hold the full value and the other hosts would write identical bytes
        to the same shared path."""
        if not self.primary:
            return
        cfg = self.cfg
        tree = {
            "params": self.params,
            "opt_state": state.opt_state,
        }
        if self._depth_state is not None:
            # joint mode: persist the depth optimizer moments alongside the
            # NeRF ones so a joint resume is exact for both nets
            tree["depth_opt_state"] = self._depth_state.opt_state
        outdir = os.path.join(self.expdir, subdir) if subdir else self.expdir
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"{i:06d}.npz")
        if cfg.train_mode == "depth_net":
            path = os.path.join(outdir, f"depth_{i:06d}.npz")
        ckpt_lib.save_checkpoint(path, tree, i)
        if cfg.export_torch_ckpt and not subdir:
            # route each live optax state to its torch Adam (SURVEY §7
            # round-trip): depth_net mode steps only the sampling optimizer
            # (like the reference), nerf mode only the NeRF one, joint both
            nerf_opt = state.opt_state if cfg.train_mode != "depth_net" else None
            depth_opt = (
                state.opt_state
                if cfg.train_mode == "depth_net"
                else (
                    self._depth_state.opt_state
                    if self._depth_state is not None
                    else None
                )
            )
            ckpt_lib.export_torch_checkpoint(
                os.path.join(self.expdir, f"{i:06d}.tar"),
                i,
                self.params.coarse,
                self.params.fine,
                self.params.depth,
                lrate=cfg.lrate,
                depth_net_lr=cfg.depth_net_lr,
                nerf_opt_state=nerf_opt,
                depth_opt_state=depth_opt,
                lrate_decay=cfg.lrate_decay,
            )
        print("Saved checkpoints at", path)

    def save_rays_data(self, rays_o, pts, alpha) -> str:
        """Dump ray data for later visualization as safetensors
        (reference sampling_trainer.py:124-138)."""
        from safetensors.numpy import save_file

        filename = os.path.join(
            self.expdir, f"{self.cfg.expname}_{self.global_step}.safetensors"
        )
        save_file(
            {
                "origins": np.ascontiguousarray(rays_o, dtype=np.float32),
                "pts": np.ascontiguousarray(pts, dtype=np.float32),
                "alpha": np.ascontiguousarray(alpha, dtype=np.float32),
            },
            filename,
        )
        return filename

    def save_spiral_video(self, i: int) -> None:
        cfg, scene = self.cfg, self.scene
        rgbs, disps, _ = render_path(
            self.pipeline,
            self.params,
            scene.render_poses,
            scene.hwf,
            scene.intrinsics(),
            jax.random.PRNGKey(0),
            mode=self._eval_mode(),
            chunk=cfg.chunk,
            verbose=False,
            mesh=self.mesh,
        )
        if not self.primary:
            return  # the render above ran globally; only process 0 encodes
        moviebase = os.path.join(self.expdir, f"{cfg.expname}_spiral_{i:06d}_")
        from nerf_sampling_tpu.utils.video import write_video

        print("video:", write_video(moviebase + "rgb", to8b(rgbs)))
        disp_frames = to8b(
            np.repeat(disps[..., None], 3, -1) / max(np.max(disps), 1e-8)
        )
        print("video:", write_video(moviebase + "disp", disp_frames))

    # ------------------------------------------------------------------
    # render-only (reference Trainer.render, :181-230)
    # ------------------------------------------------------------------

    def render_only_path(self) -> float:
        cfg, scene = self.cfg, self.scene
        if cfg.render_test:
            poses = scene.poses[scene.i_test]
            gt = scene.images[scene.i_test]
        else:
            poses = scene.render_poses
            gt = None
        testsavedir = None
        if self.primary:
            testsavedir = os.path.join(
                self.expdir,
                "renderonly_{}_{:06d}".format(
                    "test" if cfg.render_test else "path", self.global_step
                ),
            )
            os.makedirs(testsavedir, exist_ok=True)
        rgbs, _, avg_psnr = render_path(
            self.pipeline,
            self.params,
            poses,
            scene.hwf,
            scene.intrinsics(),
            jax.random.PRNGKey(cfg.seed),
            mode=self._eval_mode(),
            chunk=cfg.chunk,
            gt_imgs=gt,
            savedir=testsavedir,
            render_factor=cfg.render_factor,
            save_scene_data=cfg.save_scene_data,
            step=self.global_step,
            logger=self.logger,
            mesh=self.mesh,
        )
        if self.primary:
            print("Done rendering", testsavedir)
            from nerf_sampling_tpu.utils.video import write_video

            print(
                "video:",
                write_video(os.path.join(testsavedir, "video"), to8b(rgbs)),
            )
        return avg_psnr
