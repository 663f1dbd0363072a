"""Render / evaluate depth-net results from the command line.

CLI parity target: reference experiments/render.py — same flags
(-c/-dp/-d/-m/-w/-si/-sr/-rt/-ssd/-nc/-nm/-nf/-e/-tmp/-ip), same manual
defaults (n_samples=2, distance=0.01, sampling_mode="uniform",
render.py:208-212), same pretrained conventions
(pretrained/nerf/<ds>/200000.tar, pretrained/depth_net/<ds>/files/
sampler_experiment/200000.tar, render.py:174-175), and the -e grid sweep
(n_samples x [2,32,64,128], distance x [0.1,0.3,0.5,1],
modes x [uniform,gaussian] -> experiments_results.txt, render.py:237-261).
"""

from __future__ import annotations

import os

import click

from nerf_sampling_tpu.definitions import ROOT_DIR
from nerf_sampling_tpu.train.trainer import Trainer
from nerf_sampling_tpu.utils.config import load_trainer_config, override_config


@click.command()
@click.option("-c", "--config", type=str,
              default=f"{ROOT_DIR}/experiments/configs/lego.yaml", show_default=True)
@click.option("-dp", "--dataset_path", type=str)
@click.option("-d", "--dataset", type=str, help="Name of the dataset to render.")
@click.option("-m", "--model", type=str, default="lego_depth_net_module",
              show_default=True)
@click.option("-w", "--wandb", "wandb_mode",
              type=click.Choice(["online", "offline", "disabled"], case_sensitive=False),
              default="disabled", show_default=True)
@click.option("-si", "--single_image", is_flag=True, default=False, show_default=True)
@click.option("-sr", "--single_ray", is_flag=True, default=False, show_default=True)
@click.option("-rt", "--render_test", is_flag=True, default=False, show_default=True,
              help="Render the test set instead of the spiral path.")
@click.option("-ssd", "--save_scene_data", is_flag=True, default=False,
              show_default=True)
@click.option("-nc", "--nerf_compare", is_flag=True, default=False, show_default=True,
              help="Compare depth net predictions to NeRF argmax samples.")
@click.option("-nm", "--nerf_max", is_flag=True, default=False, show_default=True,
              help="Use nerf max points to render.")
@click.option("-nf", "--nerf_full", is_flag=True, default=False, show_default=True,
              help="Use full nerf to render.")
@click.option("-e", "--experiments", is_flag=True, default=False, show_default=True,
              help="Run the automatic sweep grid.")
@click.option("-tmp", "--temporary", is_flag=True, default=False, show_default=True,
              help="Use temporary folder for experiment.")
@click.option("-ip", "--i_print", default=1000, show_default=True)
@click.option("--basedir", default=None, help="Override output dir.")
@click.option("--mlp_impl",
              type=click.Choice(["xla", "pallas", "pallas_int8"]),
              default="pallas", show_default=True,
              help="pallas: fused bf16 kernels (PSNR parity validated); "
                   "pallas_int8: W8A8 eval kernels (auto-calibrated on the "
                   "loaded checkpoint) — NOT recommended for final renders: "
                   "trained fields lose ~8.8 dB under int8 activations "
                   "(measured, RESULTS.md); it is quality-safe only as the "
                   "frozen-NeRF oracle in depth-net TRAINING.")
@click.option("--testskip", default=None, type=int,
              help="Load every Nth test/val image (reference --testskip).")
@click.option("--ft_path", "ft_path_opt", default=None,
              help="Explicit NeRF checkpoint to load.")
@click.option("--depth_net_path", "depth_net_path_opt", default=None,
              help="Explicit DepthNet checkpoint to load.")
@click.option("--n_samples", "n_samples_opt", default=2, show_default=True)
@click.option("--distance", "distance_opt", default=0.01, show_default=True)
@click.option("--sampling_mode", "sampling_mode_opt", default="uniform",
              type=click.Choice(["uniform", "gaussian", "depth_only"]),
              show_default=True)
def main(**kw):
    """Render depth-net results with the provided configuration."""
    cfg = load_trainer_config(kw["config"], kw["model"])
    cfg.single_image = kw["single_image"]
    cfg.single_ray = kw["single_ray"]
    cfg.save_scene_data = kw["save_scene_data"]
    cfg.i_print = kw["i_print"]
    cfg.wandb_mode = kw["wandb_mode"]
    cfg.compare_nerf = kw["nerf_compare"]
    cfg.use_nerf_max_pts = kw["nerf_max"]
    cfg.use_full_nerf = kw["nerf_full"]
    cfg.render_only = True
    cfg.render_test = True
    cfg.mlp_impl = kw["mlp_impl"]
    if kw["testskip"] is not None:
        cfg.testskip = kw["testskip"]
    if kw["render_test"]:
        cfg.render_test = True

    datadir = kw["dataset_path"]
    ft_path = None
    depth_net_path = None
    dataset_name = kw["dataset"]
    if dataset_name is not None:
        datadir = f"{ROOT_DIR}/dataset/{dataset_name}"
        from nerf_sampling_tpu.data.example import maybe_generate_example_dataset

        maybe_generate_example_dataset(dataset_name, datadir)
        ft_path = f"{ROOT_DIR}/pretrained/nerf/{dataset_name}/200000.tar"
        depth_net_path = (
            f"{ROOT_DIR}/pretrained/depth_net/{dataset_name}/files/"
            "sampler_experiment/200000.tar"
        )
        print(f"{dataset_name=}")
    if datadir is None:
        print("Please specify the name of the dataset or provide the path to the folder")
        return

    basedir = kw["basedir"] or f"./logs/{dataset_name}"

    override = {
        "depth_net_lr": 1e-4,
        "n_layers": 10,
        "layer_width": 256,
        "train_depth_net_only": True,
        "sphere_radius": 2,
    }
    override_config(config=cfg.__dict__, update=override)

    cfg.datadir = datadir
    cfg.basedir = basedir
    if kw["ft_path_opt"]:
        cfg.ft_path = kw["ft_path_opt"]
    elif ft_path and os.path.exists(ft_path):
        cfg.ft_path = ft_path
    if kw["depth_net_path_opt"]:
        cfg.depth_net_path = kw["depth_net_path_opt"]
    elif depth_net_path and os.path.exists(depth_net_path):
        cfg.depth_net_path = depth_net_path

    # manual values (reference render.py:208-212)
    n_samples = kw["n_samples_opt"]
    distance = kw["distance_opt"]
    sampling_mode = kw["sampling_mode_opt"]

    if kw["nerf_compare"]:
        cfg.expname = f"{dataset_name}_depth_net_render_mse"
    elif kw["nerf_max"]:
        cfg.expname = f"{dataset_name}_nerf_max_render"
    elif kw["nerf_full"]:
        cfg.expname = f"{dataset_name}_nerf_full_render"
    else:
        cfg.expname = (
            f"{dataset_name}_depth_net_render_n_samples_{n_samples}"
            f"_distance_{distance}_sampling_mode_{sampling_mode}"
        )
    if kw["temporary"]:
        cfg.expname = "tmp"

    cfg.n_depth_samples = n_samples
    cfg.distance = distance
    cfg.sampling_mode = sampling_mode

    if kw["experiments"]:
        exp_basedir = os.path.join(basedir, "experiments")
        os.makedirs(exp_basedir, exist_ok=True)
        n_samples_list = [2, 32, 64, 128]
        distances = [0.1, 0.3, 0.5, 1]
        sampling_modes = ["uniform", "gaussian"]
        f = os.path.join(exp_basedir, "experiments_results.txt")
        with open(f, "w") as file:
            file.write("Experiments")
        for sampling_mode in sampling_modes:
            cfg.basedir = os.path.join(exp_basedir, sampling_mode)
            with open(f, "a") as file:
                file.write(f"\n\nSampling mode: {sampling_mode}\n\n")
            for n_samples in n_samples_list:
                with open(f, "a") as file:
                    file.write(f"N_samples: {n_samples}:\n")
                for distance in distances:
                    cfg.expname = (
                        f"{dataset_name}_depth_net_render_n_samples_{n_samples}"
                        f"_distance_{distance}_sampling_mode_{sampling_mode}"
                    )
                    cfg.n_depth_samples = n_samples
                    cfg.distance = distance
                    cfg.sampling_mode = sampling_mode
                    trainer = Trainer(cfg)
                    psnr = trainer.train(N_iters=1)
                    with open(f, "a") as file:
                        file.write(f"    Distance: {distance}, PSNR: {psnr:.2f}\n")
        return

    trainer = Trainer(cfg)
    psnr = trainer.train(N_iters=1)
    print(f"Final psnr: {psnr}")


if __name__ == "__main__":
    main()
