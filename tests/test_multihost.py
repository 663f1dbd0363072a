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


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"mh_{pid}.json"
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
                [sys.executable, WORKER, str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(out.read_text()) for out in outs]
    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 8

    # replicated metrics/params must agree bitwise across the two hosts
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["param_checksum"] == results[1]["param_checksum"]

    # ground truth: identical computation on this process's local
    # 8-device mesh (conftest forces 8 virtual CPU devices here)
    import importlib.util

    import jax
    from jax.sharding import Mesh

    from nerf_sampling_tpu.models import NeRFConfig, nerf_init
    from nerf_sampling_tpu.parallel.ops import make_sharded_nerf_train_step
    from nerf_sampling_tpu.render import NeRFParams, Pipeline
    from nerf_sampling_tpu.train.state import init_state, make_nerf_optimizer

    spec = importlib.util.spec_from_file_location("mh_smoke", WORKER)
    smoke = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(smoke)

    cfg = NeRFConfig(
        D=3, W=32, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(1,), use_viewdirs=True,
    )
    p = Pipeline(nerf=cfg, fine=cfg, N_samples=8, N_importance=8)
    params = NeRFParams(
        coarse=nerf_init(jax.random.PRNGKey(0), cfg),
        fine=nerf_init(jax.random.PRNGKey(1), cfg),
    )
    opt = make_nerf_optimizer(1e-3, 250)
    state = init_state(params, opt)
    mesh = Mesh(np.array(jax.devices()), ("rays",))
    step = make_sharded_nerf_train_step(p, opt, mesh)
    batch = smoke.make_global_batch(p, mesh)
    losses = []
    for i in range(smoke.N_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))

    # cross-process Gloo all-reduce may order the 8-shard sum differently
    # than the single-process reduction: allow fp32 reduction slack
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5)
