"""Sustained it/s of the REAL Trainer loop vs steps_per_dispatch (depth mode).

The step-level bench (bench_train_steps.py) measures ~250 it/s for the
scanned depth step, but the full Trainer loop sustains ~150 it/s at the
auto scan size (25). This script runs the production Trainer on the
example scene at several steps_per_dispatch values and attributes the gap:
per-chunk wall time is split into host pixel sampling (RaySampler.sample),
dispatch (the async multi() call), the metrics device_get (which absorbs
the device execution + tunnel round-trip), and the per-step log() path.

Usage: python scripts/bench_sustained.py [K ...]   (default: 25 50 100)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import nerf_sampling_tpu.train.trainer as trainer_mod
from nerf_sampling_tpu.data.example import generate_example_dataset
from nerf_sampling_tpu.definitions import ROOT_DIR
from nerf_sampling_tpu.train.sampler import RaySampler
from nerf_sampling_tpu.utils.config import TrainerConfig

N_ITERS = 2001  # steps per arm (compile excluded via chunk timestamps)

acc: dict = {}


def reset_acc():
    acc.update(sample=0.0, multi=0.0, get=0.0, log=0.0, chunk_ts=[], steps=0)


# --- instrumentation: wrap the exact call sites of the scanned loop
_orig_factory = trainer_mod.make_multi_step
_orig_sample = RaySampler.sample
_orig_get = jax.device_get
_orig_log = trainer_mod.Trainer.log


def _timed_factory(*a, **k):
    multi = _orig_factory(*a, **k)

    def wrapped(*args):
        t0 = time.perf_counter()
        out = multi(*args)  # async dispatch: host-side cost only
        acc["multi"] += time.perf_counter() - t0
        return out

    return wrapped


def _timed_sample(self, i):
    t0 = time.perf_counter()
    out = _orig_sample(self, i)
    acc["sample"] += time.perf_counter() - t0
    return out


def _timed_get(x):
    t0 = time.perf_counter()
    out = _orig_get(x)
    acc["get"] += time.perf_counter() - t0
    acc["chunk_ts"].append(time.perf_counter())
    return out


def _timed_log(self, i, metrics, state, timer=None):
    t0 = time.perf_counter()
    out = _orig_log(self, i, metrics, state, timer)
    acc["log"] += time.perf_counter() - t0
    acc["steps"] += 1
    return out


trainer_mod.make_multi_step = _timed_factory
RaySampler.sample = _timed_sample
jax.device_get = _timed_get
trainer_mod.Trainer.log = _timed_log


def run_arm(k: int, datadir: str) -> dict:
    reset_acc()
    cfg = TrainerConfig(
        dataset_type="blender",
        datadir=datadir,
        basedir="/tmp/bench_sustained",
        expname=f"k{k}",
        train_mode="depth_net",
        mlp_impl="pallas",
        matmul_precision="high",
        n_layers=10,
        layer_width=256,
        steps_per_dispatch=k,
        i_print=100,
        i_weights=1_000_000,
        i_testset=1_000_000,
        i_video=1_000_000,
        no_reload=True,
        keep_best=False,
    )
    t = trainer_mod.Trainer(cfg)
    t.train(N_ITERS)
    ts = acc["chunk_ts"]
    # steady state: drop the first two chunks (compile + warm buffers)
    n_chunks = len(ts)
    skip = min(2, n_chunks - 1)
    steady_s = ts[-1] - ts[skip]
    steady_steps = (n_chunks - 1 - skip) * k
    its = steady_steps / steady_s if steady_s > 0 else float("nan")
    per_chunk_ms = 1000 * steady_s / max(1, n_chunks - 1 - skip)
    return {
        "k": k,
        "sustained_it_s": round(its, 1),
        "per_chunk_ms": round(per_chunk_ms, 1),
        "host_sample_ms_per_chunk": round(1000 * acc["sample"] / n_chunks, 1),
        "dispatch_ms_per_chunk": round(1000 * acc["multi"] / n_chunks, 1),
        "device_get_ms_per_chunk": round(1000 * acc["get"] / n_chunks, 1),
        "log_ms_per_step": round(1000 * acc["log"] / max(1, acc["steps"]), 2),
        "n_chunks": n_chunks,
    }


def main():
    ks = [int(a) for a in sys.argv[1:]] or [25, 50, 100]
    datadir = f"{ROOT_DIR}/dataset/example"
    if not os.path.exists(datadir):
        print(f"generating example dataset at {datadir}", file=sys.stderr)
        generate_example_dataset(datadir, H=800, W=800, variant="sphere")
    results = [run_arm(k, datadir) for k in ks]
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
