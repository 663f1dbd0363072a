"""Headline benchmark: rays/sec at 800x800 Blender render, 64-sample budget.

Metric definition (BASELINE.json): render an 800^2 image where every ray is
shaded with 64 NeRF MLP queries (the vanilla coarse budget the reference's
DepthNet claims to replace), full-size 8x256 viewdirs NeRF, float32.

``vs_baseline`` compares against a reference-equivalent PyTorch renderer
(same math: 63/27-dim positional encoding -> 8x256 skip MLP -> alpha
compositing, chunked eager execution as in reference nerf_utils.py:45-85 /
Trainer.py:789-806) measured on this machine's CPU — the reference publishes
no numbers and this box has no CUDA (BASELINE.md). NB this is a
torch-CPU(-multithreaded eager) baseline, not a GPU one. The torch
measurement is cached in BASELINE_MEASURED.json after the first run.

Fault tolerance: the axon-tunneled TPU shows transient failures
(FAILED_PRECONDITION during compile readback, chip-grant holds after a
killed process — see RESULTS.md). The measurement therefore runs in a
subprocess with retries + backoff so one transient cannot cost the round's
perf artifact, and the jax persistent compilation cache is enabled so a
retry does not pay the multi-minute remote AOT compile again.

Prints exactly one JSON line on stdout (diagnostics go to stderr).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

H = W = 800
N_SAMPLES = 64
CHUNK = 1 << 17
_DIR = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(_DIR, "BASELINE_MEASURED.json")
RETRIES = 3
BACKOFF_S = 75  # > typical chip-grant hold after a killed TPU process


def _measure_torch_baseline() -> float:
    """Reference-equivalent torch renderer, rays/sec on CPU (cached)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_rays_per_sec"]

    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)

    class TorchNeRF(torch.nn.Module):
        def __init__(self, D=8, Wd=256, input_ch=63, input_ch_views=27):
            super().__init__()
            self.input_ch, self.input_ch_views = input_ch, input_ch_views
            self.skips = [4]
            layers = [torch.nn.Linear(input_ch, Wd)]
            for i in range(D - 1):
                ic = Wd + input_ch if i in self.skips else Wd
                layers.append(torch.nn.Linear(ic, Wd))
            self.pts_linears = torch.nn.ModuleList(layers)
            self.views_linears = torch.nn.ModuleList(
                [torch.nn.Linear(input_ch_views + Wd, Wd // 2)]
            )
            self.feature_linear = torch.nn.Linear(Wd, Wd)
            self.alpha_linear = torch.nn.Linear(Wd, 1)
            self.rgb_linear = torch.nn.Linear(Wd // 2, 3)

        def forward(self, x):
            pts, views = torch.split(x, [self.input_ch, self.input_ch_views], -1)
            h = pts
            for i, l in enumerate(self.pts_linears):
                h = F.relu(l(h))
                if i in self.skips:
                    h = torch.cat([pts, h], -1)
            alpha = self.alpha_linear(h)
            feat = self.feature_linear(h)
            h = F.relu(self.views_linears[0](torch.cat([feat, views], -1)))
            return torch.cat([self.rgb_linear(h), alpha], -1)

    def embed(x, multires):
        out = [x]
        for f in 2.0 ** torch.arange(multires):
            out += [torch.sin(x * f), torch.cos(x * f)]
        return torch.cat(out, -1)

    model = TorchNeRF().eval()
    n_rays = 4096  # subsample; extrapolate rays/sec (CPU torch is slow)
    netchunk = 1024 * 64
    ro = torch.zeros(n_rays, 3)
    ro[:, 2] = 4.0
    rd = torch.randn(n_rays, 3) * 0.1
    rd[:, 2] = -1.0
    viewdirs = rd / rd.norm(dim=-1, keepdim=True)
    t_vals = torch.linspace(0.0, 1.0, N_SAMPLES)
    z_vals = (2.0 * (1 - t_vals) + 6.0 * t_vals).expand(n_rays, N_SAMPLES)

    def render_once():
        with torch.no_grad():
            pts = ro[:, None] + rd[:, None] * z_vals[..., None]
            flat = pts.reshape(-1, 3)
            emb = torch.cat(
                [
                    embed(flat, 10),
                    embed(
                        viewdirs[:, None].expand(-1, N_SAMPLES, 3).reshape(-1, 3), 4
                    ),
                ],
                -1,
            )
            raws = torch.cat(
                [model(emb[i : i + netchunk]) for i in range(0, emb.shape[0], netchunk)]
            ).reshape(n_rays, N_SAMPLES, 4)
            dists = z_vals[..., 1:] - z_vals[..., :-1]
            dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
            dists = dists * rd.norm(dim=-1, keepdim=True)
            rgb = torch.sigmoid(raws[..., :3])
            alpha = 1.0 - torch.exp(-F.relu(raws[..., 3]) * dists)
            weights = alpha * torch.cumprod(
                torch.cat([torch.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1),
                -1,
            )[..., :-1]
            return torch.sum(weights[..., None] * rgb, -2)

    render_once()  # warm up
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        render_once()
    dt = (time.perf_counter() - t0) / reps
    rays_per_sec = n_rays / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "torch_cpu_rays_per_sec": rays_per_sec,
                "note": (
                    "reference-equivalent PyTorch eager renderer, 64 samples/ray, "
                    "8x256 viewdirs NeRF, fp32, measured on this machine's CPU "
                    f"({os.cpu_count()} cores); reference publishes no numbers "
                    "and no CUDA device exists here"
                ),
            },
            f,
            indent=2,
        )
    return rays_per_sec


def _enable_cache() -> None:
    """Persistent compilation cache: a retried run must not pay the remote
    AOT compile (minutes on the axon backend) a second time."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover
        print(f"[bench] compilation cache unavailable: {e}", file=sys.stderr)


def _timed_median(run_once, label: str, reps: int = 5, rounds: int = 3) -> float:
    """Median-of-reps timing with bad-window rejection (see module doc).

    run_once(i) must block until the device work is done (one-element
    readback — block_until_ready can return at enqueue on this backend).
    Returns the best accepted round's median seconds.
    """
    best_dt = None
    for round_i in range(rounds):
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            run_once(round_i * reps + i)
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        spread = times[-1] / max(times[0], 1e-9)
        print(
            f"[bench] {label} round {round_i} per-rep times (s): "
            f"{[round(t, 3) for t in times]} (median {dt:.3f}, spread {spread:.2f}x)",
            file=sys.stderr,
        )
        if best_dt is None or dt < best_dt:
            best_dt = dt
        if spread < 2.0:
            break
        print("[bench] unstable round (spread >= 2x); re-measuring", file=sys.stderr)
    return best_dt


def _measure_tpu() -> float:
    import jax

    _enable_cache()

    import numpy as np

    from nerf_sampling_tpu.models.nerf import nerf_init_active
    from nerf_sampling_tpu.render import EvalMode, NeRFParams, render_image
    from nerf_sampling_tpu.utils.config import TrainerConfig

    cfg = TrainerConfig(N_samples=N_SAMPLES, N_importance=0, mlp_impl="pallas")
    pipeline = cfg.pipeline(with_depth=False)
    # nerf_init_active, not nerf_init: default init is density-dead (every
    # ray composites to the white background), which made the r1/r2 bench
    # render a constant image. Throughput is shape-static either way, but
    # the headline number should come from a non-trivial field — and the
    # structure assert below would be vacuous otherwise.
    params = NeRFParams(
        coarse=nerf_init_active(jax.random.PRNGKey(0), pipeline.nerf)
    )

    focal = 0.5 * W / 0.3566  # tan(0.5 * camera_angle_x)
    # Host-side constants: closing device arrays over a jit makes lowering
    # read them back from the device (the BENCH_r01 failure mode).
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float32)
    c2w = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32)

    render = jax.jit(
        lambda prm, key: render_image(
            pipeline, prm, H, W, K, c2w, key, EvalMode.FULL_NERF, chunk=CHUNK
        )
    )

    def sync(out):
        # NB: on the axon backend block_until_ready can return at enqueue;
        # only a device->host transfer guarantees completion. Read ONE
        # element (device-side slice): np.asarray(full image) would ship
        # 7.7 MB through the tunnel per rep (~170 ms — measured), timing
        # the transport instead of the render.
        return float(out["depth_net_rgb_map"][0, 0, 0])

    import jax.numpy as jnp

    # Chip-health probe: a pure bf16 matmul chain should sustain a large
    # fraction of the 197 TFLOP/s peak. If even the MXU reads degraded,
    # the tunnel/chip window is bad and ANY number measured now would
    # slander the chip (observed: a sustained window where every render
    # rep ran ~25x slow) — abort with a distinct rc so the retry loop
    # re-runs later. A healthy matmul with a slow render is a genuine
    # regression and is still reported.
    M = 8192
    a = jnp.ones((M, M), jnp.bfloat16)
    b = jnp.eye(M, dtype=jnp.bfloat16)

    @jax.jit
    def chain(x, y):
        for _ in range(8):
            x = jnp.dot(x, y, preferred_element_type=jnp.bfloat16)
        return x

    float(chain(a, b)[0, 0])  # compile + warm
    mm_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a, b)[0, 0])
        mm_times.append(time.perf_counter() - t0)
    mm_tflops = 8 * 2 * M**3 / sorted(mm_times)[1] / 1e12
    print(f"[bench] matmul-chain health: {mm_tflops:.0f} TFLOP/s", file=sys.stderr)
    if mm_tflops < 60.0:
        print(
            "[bench] chip/tunnel window degraded (matmul far below peak); "
            "aborting this attempt",
            file=sys.stderr,
        )
        sys.exit(3)

    key = jax.random.PRNGKey(0)
    out = render(params, key)  # compile + warm up
    img = out["depth_net_rgb_map"]
    assert bool(jnp.isfinite(img).all())
    # non-vacuity: the rendered field must have actual structure, not a
    # constant background (the r2 bench's density-dead init rendered white)
    img_std = float(jnp.std(img))
    assert img_std > 0.01, f"rendered image is ~constant (std={img_std})"
    print(f"[bench] rendered image std: {img_std:.4f}", file=sys.stderr)
    sync(out)

    # Per-rep timing with a median: the tunneled TPU shows multi-x run-to-
    # run variance (transport hiccups), and the median of individual image
    # renders is the stable estimate of chip capability. A whole
    # measurement round can land in a bad window (observed: every rep ~9 s
    # vs the true ~0.35 s right after another process released the chip),
    # so rounds whose reps disagree by >2x are rejected and re-measured,
    # and the best round's median is reported (up to 3 rounds).
    best_dt = _timed_median(
        lambda i: sync(render(params, jax.random.fold_in(key, i))), "headline"
    )
    return H * W / best_dt


PROD_CKPT = os.path.join(_DIR, "evidence", "ckpt", "example_depth.npz")
PROD_EXPECTED = os.path.join(_DIR, "evidence", "ckpt", "expected.json")


def production_render_setup(ckpt_path: str, mlp_impl: str = "pallas") -> dict:
    """Build the PRODUCTION render (reference nerf_utils.py:837-849): the
    trained DepthNet's one query + uniform/64 populate on the trained NeRF,
    test view 0 of the example scene at 400^2 — the recipe's headline cell
    (RESULTS.md: 30.84 dB vs 30.91 for the full 256-query hierarchical).

    Loads the committed params-only fp16 checkpoint (cast back to fp32),
    regenerates the procedural dataset if needed, and returns everything
    psnr_of_render / the timing loop use. mlp_impl="pallas_int8" runs the
    W8A8 eval kernels (calibrated here on the loaded checkpoint).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_cache()

    from nerf_sampling_tpu.data.blender import load_blender_data
    from nerf_sampling_tpu.definitions import ROOT_DIR
    from nerf_sampling_tpu.models import depth_net_init, nerf_init
    from nerf_sampling_tpu.render import EvalMode, NeRFParams, render_image
    from nerf_sampling_tpu.train import checkpoint as ckpt_lib
    from nerf_sampling_tpu.utils.config import load_trainer_config

    datadir = f"{ROOT_DIR}/dataset/example"
    if not os.path.exists(datadir):
        from nerf_sampling_tpu.data.example import generate_example_dataset

        generate_example_dataset(datadir, H=800, W=800)
    scene = load_blender_data(datadir, half_res=True, testskip=1)
    scene.composite_white_background()

    cfg = load_trainer_config(
        f"{ROOT_DIR}/experiments/configs/lego.yaml",
        "recommended_depth_net_module",
    )
    # run.py's hard overrides (reference run.py:101-109) — the trained
    # checkpoint's DepthNet is 10x256, not the TrainerConfig default 6x256
    cfg.n_layers, cfg.layer_width, cfg.sphere_radius = 10, 256, 2
    pipeline = dataclasses.replace(
        cfg.pipeline(with_depth=True),
        n_depth_samples=64,
        sampling_mode="uniform",
        distance=1.0,
        mlp_impl=mlp_impl,
    )

    k = jax.random.PRNGKey(0)
    template = NeRFParams(
        coarse=nerf_init(k, pipeline.nerf),
        fine=nerf_init(k, pipeline.fine),
        depth=depth_net_init(k, pipeline.depth),
    )
    tree, _ = ckpt_lib.load_checkpoint(ckpt_path, {"params": template})
    # committed storage is fp16; compute wants fp32 (kernels cast to bf16)
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), tree["params"]
    )
    if mlp_impl == "pallas_int8":
        from nerf_sampling_tpu.render.quantize import calibrate_pipeline

        pipeline = calibrate_pipeline(pipeline, params, scene)

    Hs, Ws, focal = scene.hwf
    Hs, Ws = int(Hs), int(Ws)
    K = np.array(
        [[focal, 0, Ws / 2], [0, focal, Hs / 2], [0, 0, 1.0]], np.float32
    )
    view = int(scene.i_test[0])
    c2w = np.asarray(scene.poses[view][:3, :4], np.float32)
    gt = np.asarray(scene.images[view], np.float32)

    import functools

    render = jax.jit(
        functools.partial(
            render_image, pipeline, H=Hs, W=Ws, K=K, c2w=c2w,
            mode=EvalMode.DEPTH_NET, chunk=CHUNK,
        )
    )

    # Batched variant: every test view's rays in ONE flat dispatch — how
    # production test-set rendering actually runs (reference render path
    # nerf_utils.py:258-390 loops poses; here the loop is one fused call).
    # The decomposition probe (scripts/probe_production_arm.py) measured
    # ~30 ms of fixed per-dispatch overhead — 25% of a single 400^2 frame,
    # amortized 4x by batching the 4-view test set.
    from nerf_sampling_tpu.core import get_rays
    from nerf_sampling_tpu.render import render_flat_rays

    ros, rds, gts = [], [], []
    for v in [int(v) for v in scene.i_test]:
        ro, rd = get_rays(Hs, Ws, K, np.asarray(scene.poses[v][:3, :4], np.float32))
        ros.append(np.asarray(ro, np.float32).reshape(-1, 3))
        rds.append(np.asarray(rd, np.float32).reshape(-1, 3))
        gts.append(np.asarray(scene.images[v], np.float32))
    render_batched = jax.jit(
        functools.partial(render_flat_rays, pipeline, mode=EvalMode.DEPTH_NET)
    )
    return {
        "render": render,
        "render_batched": render_batched,
        "rays_o_all": jnp.asarray(np.concatenate(ros)),
        "rays_d_all": jnp.asarray(np.concatenate(rds)),
        "gts": gts,
        "params": params,
        "gt": gt,
        "n_rays": Hs * Ws,
        "hw": (Hs, Ws),
        "mlp_impl": mlp_impl,
        "pipeline": pipeline,
    }


def psnr_of_render(setup: dict) -> tuple[float, float]:
    """(PSNR vs ground truth, image std) of one production render."""
    import jax
    import numpy as np

    out = setup["render"](setup["params"], key=jax.random.PRNGKey(0))
    img = np.asarray(out["depth_net_rgb_map"], np.float32)
    assert np.isfinite(img).all()
    mse = float(np.mean((img - setup["gt"]) ** 2))
    return -10.0 * np.log10(mse), float(img.std())


def _measure_production() -> dict:
    """The production-path arm: rays/s + PSNR-vs-evidence on the committed
    trained checkpoint, bf16 and int8 (VERDICT r3 asks #1/#2)."""
    import json as _json

    import jax

    if not os.path.exists(PROD_CKPT):
        print("[bench] no committed production checkpoint; skipping arm",
              file=sys.stderr)
        return {}
    expected = (
        _json.load(open(PROD_EXPECTED)) if os.path.exists(PROD_EXPECTED)
        else {}
    ).get("example", {})

    res: dict = {}
    for impl, prefix in (("pallas", "production"), ("pallas_int8", "int8")):
        setup = production_render_setup(PROD_CKPT, impl)
        psnr, img_std = psnr_of_render(setup)
        print(f"[bench] {prefix} ({impl}): PSNR {psnr:.2f} dB, std {img_std:.4f}",
              file=sys.stderr)
        assert img_std > 0.01, f"{impl}: rendered image is ~constant"
        if impl == "pallas" and "psnr_view0" in expected:
            delta = abs(psnr - expected["psnr_view0"])
            assert delta <= 0.2, (
                f"production PSNR {psnr:.3f} vs evidence "
                f"{expected['psnr_view0']} (|delta| {delta:.3f} > 0.2 dB)"
            )

        def run_once(i, _setup=setup):
            out = _setup["render"](
                _setup["params"], key=jax.random.fold_in(jax.random.PRNGKey(1), i)
            )
            return float(out["depth_net_rgb_map"][0, 0, 0])

        run_once(0)  # warm
        dt = _timed_median(run_once, prefix)
        res[f"{prefix}_rays_per_sec"] = round(setup["n_rays"] / dt, 1)
        res[f"{prefix}_psnr"] = round(psnr, 3)

        if impl == "pallas":
            # whole-test-set batched dispatch (see production_render_setup)
            import numpy as np

            Hs, Ws = setup["hw"]
            n_all = int(setup["rays_o_all"].shape[0])

            def run_batched(i, _setup=setup):
                out = _setup["render_batched"](
                    _setup["params"], _setup["rays_o_all"],
                    _setup["rays_d_all"],
                    jax.random.fold_in(jax.random.PRNGKey(1), i),
                )
                return float(out["depth_net_rgb_map"][0, 0])

            out = setup["render_batched"](
                setup["params"], setup["rays_o_all"], setup["rays_d_all"],
                jax.random.PRNGKey(0),
            )  # warm + quality check: per-view PSNR from the batched render
            imgs = np.asarray(
                out["depth_net_rgb_map"], np.float32
            ).reshape(len(setup["gts"]), Hs, Ws, 3)
            psnrs = [
                -10.0 * np.log10(float(np.mean((img - gt) ** 2)))
                for img, gt in zip(imgs, setup["gts"])
            ]
            print(
                "[bench] production batched (4 views): PSNRs "
                + " ".join(f"{p:.2f}" for p in psnrs),
                file=sys.stderr,
            )
            if "psnr_view0" in expected:
                assert abs(psnrs[0] - expected["psnr_view0"]) <= 0.2, (
                    f"batched view-0 PSNR {psnrs[0]:.3f} vs evidence "
                    f"{expected['psnr_view0']}"
                )
            dtb = _timed_median(run_batched, f"{prefix}_batched")
            res[f"{prefix}_batched_rays_per_sec"] = round(n_all / dtb, 1)
            res[f"{prefix}_batched_psnr_avg"] = round(float(np.mean(psnrs)), 3)
    if "psnr_view0" in expected:
        res["production_psnr_expected"] = expected["psnr_view0"]
    res["production_cell"] = "depth_net uniform/64/1.0, 400^2 test view 0"
    if "int8_psnr" in res:
        # the low int8 PSNR is DOCUMENTATION of the disqualified mode, not
        # a regression: trained fields lose ~8.8 dB under int8 activations
        # (RESULTS.md int8 quality study); the mode is opt-in and
        # quality-safe only as the frozen-NeRF depth-train oracle
        res["int8_status"] = (
            "opt-in, render-disqualified (trained-field activations do not "
            "fit 8 bits; quality-safe only as the depth-train oracle)"
        )
    return res


def _measure_tpu_with_retries() -> tuple[float, dict]:
    """Run the TPU measurement in a subprocess, retrying transients.

    A fresh process per attempt matters: a FAILED_PRECONDITION / wedged
    runtime can poison the TPU client for the rest of the process, and a
    killed attempt's chip grant needs the backoff to release.
    """
    last_tail = ""
    for attempt in range(1, RETRIES + 1):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tpu-worker"],
            capture_output=True,
            text=True,
            timeout=2400,
            cwd=_DIR,
        )
        rays, prod = None, {}
        for line in proc.stdout.splitlines():
            if line.startswith("TPU_RAYS_PER_SEC="):
                rays = float(line.split("=", 1)[1])
            elif line.startswith("PROD_JSON="):
                prod = json.loads(line.split("=", 1)[1])
        if rays is not None:
            return rays, prod
        last_tail = (proc.stderr or "")[-2000:]
        print(
            f"[bench] TPU attempt {attempt}/{RETRIES} failed (rc={proc.returncode}); "
            f"stderr tail:\n{last_tail}",
            file=sys.stderr,
        )
        if attempt < RETRIES:
            print(f"[bench] backing off {BACKOFF_S}s before retry", file=sys.stderr)
            time.sleep(BACKOFF_S)
    raise RuntimeError(f"TPU measurement failed after {RETRIES} attempts:\n{last_tail}")


def main() -> None:
    if "--tpu-worker" in sys.argv:
        print(f"TPU_RAYS_PER_SEC={_measure_tpu()}")
        print(f"PROD_JSON={json.dumps(_measure_production())}")
        return
    tpu_rays, prod = _measure_tpu_with_retries()
    torch_rays = _measure_torch_baseline()
    # Self-describing artifact (VERDICT r4 weak #7/#8): the honest
    # comparisons ride IN the JSON, not only in BASELINE.md prose.
    # 76 MFLOP/ray = matmul-only work of 64 queries through the 8x256
    # viewdirs NeRF (BASELINE.md derivation); 197.7 TFLOP/s = this v5e's
    # MEASURED bf16 matmul-chain ceiling (scripts/profile_kernel.py).
    mfu = tpu_rays * 76.0e6 / 197.7e12
    print(
        json.dumps(
            {
                "metric": "rays/sec, 800x800 render @ 64 NeRF queries/ray (fused bf16 kernel, fp32-parity PSNR)",
                "value": round(tpu_rays, 1),
                "unit": "rays/s",
                "vs_baseline": round(tpu_rays / torch_rays, 2),
                "baseline_basis": (
                    "reference-equivalent torch renderer on THIS HOST'S CPU "
                    "(BASELINE_MEASURED.json; no CUDA device exists here). "
                    "Cross-hardware: ~14x the reference-as-written on A100 "
                    "fp32 eager by roofline (BASELINE.md)"
                ),
                "mfu": round(mfu, 3),
                "mfu_basis": (
                    "issued matmul FLOPs (76 MFLOP/ray, 64-query budget) "
                    "over the chip's measured 197.7 TFLOP/s bf16 ceiling"
                ),
                # production arm: trained checkpoint, DepthNet oracle +
                # uniform/64 populate (the method's actual operating point),
                # bf16 + int8, PSNR tied to the committed evidence
                **prod,
            }
        )
    )


if __name__ == "__main__":
    main()
