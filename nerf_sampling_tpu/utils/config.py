"""One typed config tree replacing the reference's three overlapping systems.

The reference mixes (a) YAML + dynamic class import, (b) click options with
hard-coded overrides, (c) a legacy configargparse with 16 .txt files
(SURVEY.md §5 "Config / flag system"). Here a single ``TrainerConfig``
dataclass carries every knob; YAML configs (with anchors) and the legacy
.txt configs both load into it. ``override_config`` keeps the reference's
strict-key merge semantics (utils.py:125-140).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any

from nerf_sampling_tpu.models.depth_net import DepthNetConfig
from nerf_sampling_tpu.models.nerf import NeRFConfig
from nerf_sampling_tpu.render.engine import Pipeline


@dataclasses.dataclass
class TrainerConfig:
    """Every trainer knob (superset of reference Trainer.__init__,
    Trainer.py:19-130 + BlenderTrainer + DepthNetTrainer kwargs)."""

    # identity / io
    dataset_type: str = "blender"
    basedir: str = "./logs"
    expname: str = "experiment"
    datadir: str = ""
    config_path: str | None = None
    # keys the source config file EXPLICITLY set (filled by the loaders);
    # lets CLIs distinguish "user chose this value" from a field default
    # without re-parsing the file.
    explicit_keys: frozenset = frozenset()
    device: str = "tpu"  # accepted for reference-config compat; jax picks backend

    # ray batching / pixel sampling
    N_rand: int = 1024
    no_batching: bool = True
    chunk: int = 1024 * 32
    netchunk: int = 1024 * 64  # accepted for compat; jit makes it a no-op
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    single_image: bool = False
    single_ray: bool = False

    # NeRF architecture
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    multires: int = 10
    multires_views: int = 4
    i_embed: int = 0
    input_dims_embed: int = 3
    use_viewdirs: bool = True

    # sampling / rendering
    N_samples: int = 64
    N_importance: int = 128
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    lindisp: bool = False
    white_bkgd: bool = True
    near: float = 2.0
    far: float = 6.0

    # dataset options
    half_res: bool = True
    testskip: int = 8
    # llff
    factor: int = 8
    no_ndc: bool = False
    spherify: bool = False
    llffhold: int = 8
    path_zflat: bool = False  # flattened half-spiral render path (load_llff.py:317-323)
    # deepvoxels
    shape: str = "greek"

    # depth net
    n_layers: int = 6
    layer_width: int = 256
    sphere_radius: float = 2.0
    depth_net_lr: float = 1e-4
    train_depth_net_only: bool = True
    depth_net_path: str | None = None
    n_depth_samples: int = 2
    distance: float = 0.01
    sampling_mode: str = "uniform"

    # optimization
    lrate: float = 5e-4
    lrate_decay: int = 250
    train_mode: str = "depth_net"  # "depth_net" | "nerf" (vanilla) | "joint" (both)

    # checkpoints
    ft_path: str | None = None
    no_reload: bool = False
    export_torch_ckpt: bool = True

    # logging / eval cadence
    i_print: int = 100
    i_img: int = 500  # accepted for reference flag parity (nerf_utils.py:1089);
    # the reference itself never reads it in Trainer either
    i_weights: int = 10000
    i_testset: int = 20000
    i_video: int = 100000
    # --- multi-chip scale-out (no reference analog: it is single-device)
    n_devices: int = 1  # 0 = all local devices; >1 = DP over that many
    multihost: bool = False  # jax.distributed.initialize before mesh setup
    save_train_set_render: bool = False
    wandb_mode: str = "disabled"
    # best-checkpoint selection / early stop on eval PSNR. DepthNet training
    # past ~10k iters can drift eval quality DOWN (argmax targets of
    # background rays are noise — same objective as the reference,
    # Trainer.py:537-543); keep_best makes reference-EPOCHS runs recoverable
    # and early_stop_patience (test evals without improvement; 0 = off)
    # stops them.
    keep_best: bool = True
    early_stop_patience: int = 0
    # EXTENSION (1.0 = exact reference objective): weight on background
    # rays' depth-MSE in depth-net training — the r3 drift diagnosis
    # measured 85% of the reference objective to be background argmax
    # noise (RESULTS.md); set < 1 (e.g. 0.0) to train depth on
    # foreground geometry only.
    bg_depth_loss_weight: float = 1.0
    # EXTENSION (0 = off): joint mode only — freeze the depth net for the
    # first N steps so from-scratch joint training survives the random-NeRF
    # phase (see Pipeline.joint_depth_warmup).
    joint_depth_warmup: int = 0

    # render-only modes
    render_only: bool = False
    render_test: bool = False
    render_factor: int = 0
    save_scene_data: bool = False
    compare_nerf: bool = False
    use_nerf_max_pts: bool = False
    use_full_nerf: bool = False

    # execution backend for the NeRF MLP ("xla" | "pallas"; see Pipeline)
    mlp_impl: str = "xla"
    # train steps fused into one dispatch via lax.scan (steps.make_multi_step).
    # 0 = auto: the largest divisor of the logging cadences <= 100 on a real
    # accelerator (per-step dispatch through the remote tunnel costs
    # milliseconds), 1 on cpu / when profiling. Composes with the device
    # mesh (the scan is jitted with the batch stack sharded on rays).
    # Explicit values that don't divide the logging cadences are rounded
    # down so checkpoints/logs stay step-exact.
    steps_per_dispatch: int = 0
    # XLA-path matmul precision: "highest" (fp32 parity) | "high" | "default"
    # (bf16 MXU — faster training at slightly noisier depth targets)
    matmul_precision: str = "highest"

    # observability (SURVEY.md §5: first-class tracing, the reference has none)
    profile_dir: str | None = None  # jax.profiler trace of steps [20, 40)
    debug_nans: bool = False  # fail at the op producing a NaN

    # misc
    seed: int = 42

    # ------------------------------------------------------------------
    def nerf_config(self, fine: bool = False) -> NeRFConfig:
        from nerf_sampling_tpu.core.encoding import Embedder

        if self.i_embed == -1:
            input_ch, input_ch_views = 3, 3 if self.use_viewdirs else 0
        else:
            input_ch = Embedder(self.input_dims_embed, self.multires).out_dim
            input_ch_views = (
                Embedder(self.input_dims_embed, self.multires_views).out_dim
                if self.use_viewdirs
                else 0
            )
        return NeRFConfig(
            D=self.netdepth_fine if fine else self.netdepth,
            W=self.netwidth_fine if fine else self.netwidth,
            input_ch=input_ch,
            input_ch_views=input_ch_views,
            # output_ch = 5 if N_importance > 0 (reference nerf_utils.py:406);
            # ignored when use_viewdirs
            output_ch=5 if self.N_importance > 0 else 4,
            skips=(4,),
            use_viewdirs=self.use_viewdirs,
            precision=self.matmul_precision,
        )

    def depth_net_config(self) -> DepthNetConfig:
        # reference sampling_trainer.py:68-74: hidden == cat == [width]*n_layers
        sizes = tuple(self.layer_width for _ in range(self.n_layers))
        return DepthNetConfig(
            hidden_sizes=sizes,
            cat_hidden_sizes=sizes,
            multires=10,
            sphere_radius=self.sphere_radius,
            near=self.near,
            far=self.far,
            precision=self.matmul_precision,
        )

    def pipeline(self, with_depth: bool = True) -> Pipeline:
        ndc = self.dataset_type == "llff" and not self.no_ndc
        return Pipeline(
            nerf=self.nerf_config(False),
            fine=self.nerf_config(True) if self.N_importance > 0 else None,
            depth=self.depth_net_config() if with_depth else None,
            multires=self.multires,
            multires_views=self.multires_views,
            i_embed=self.i_embed,
            N_samples=self.N_samples,
            N_importance=self.N_importance,
            perturb=self.perturb,
            raw_noise_std=self.raw_noise_std,
            white_bkgd=self.white_bkgd,
            lindisp=self.lindisp,
            use_viewdirs=self.use_viewdirs,
            ndc=ndc,
            near=self.near,
            far=self.far,
            n_depth_samples=self.n_depth_samples,
            sampling_mode=self.sampling_mode,
            distance=self.distance,
            mlp_impl=self.mlp_impl,
            netchunk=self.netchunk,
            bg_depth_loss_weight=self.bg_depth_loss_weight,
            joint_depth_warmup=self.joint_depth_warmup,
        )


def override_config(config: dict, update: dict) -> None:
    """Strict-key dict merge (reference utils.py:125-140)."""
    config_keys = config.keys()
    for key, value in update.items():
        if key in config_keys:
            config[key] = value
        else:
            raise KeyError(f"Key {key} does not exist in config")


def load_obj_from_config(cfg: dict) -> Any:
    """Dynamic {"module", "kwargs"} instantiation (reference utils.py:12-21)."""
    module_name, class_name = cfg["module"].rsplit(".", maxsplit=1)
    cls = getattr(importlib.import_module(module_name), class_name)
    return cls(**cfg["kwargs"])


def _coerce(kwargs: dict) -> dict:
    """Drop YAML 'None' placeholders and unknown keys -> TrainerConfig kwargs."""
    fields = {f.name for f in dataclasses.fields(TrainerConfig)}
    out = {}
    for k, v in kwargs.items():
        if k not in fields:
            continue
        if isinstance(v, str) and v == "None":
            v = None
        out[k] = v
    return out


def load_trainer_config(path: str, model_key: str | None = None) -> TrainerConfig:
    """Load a YAML experiment config (reference experiments/configs/lego.yaml
    layout: {model_key: {module, kwargs}}) into a TrainerConfig."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if model_key is not None and model_key in doc:
        doc = doc[model_key]
    kwargs = doc.get("kwargs", doc)
    coerced = _coerce(kwargs)
    cfg = TrainerConfig(**coerced)
    cfg.config_path = path
    cfg.explicit_keys = frozenset(coerced)
    return cfg


def load_legacy_txt_config(path: str) -> TrainerConfig:
    """Parse a legacy configargparse .txt config
    (reference nerf_pytorch/configs/*.txt: 'key = value' lines)."""
    kwargs: dict[str, Any] = {}
    flags = {
        "no_batching", "no_reload", "use_viewdirs", "white_bkgd", "half_res",
        "no_ndc", "lindisp", "spherify", "render_only", "render_test",
    }
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip()
            if key in flags:
                kwargs[key] = value.lower() in ("true", "1", "yes", "")
            else:
                for cast in (int, float):
                    try:
                        value = cast(value)
                        break
                    except (TypeError, ValueError):
                        continue
                kwargs[key] = value
    coerced = _coerce(kwargs)
    cfg = TrainerConfig(**coerced)
    cfg.explicit_keys = frozenset(coerced)
    return cfg
