"""Dataset-loader tests against synthesized on-disk fixtures."""

import json
import os

import numpy as np
import pytest

from nerf_sampling_tpu.data.blender import load_blender_data
from nerf_sampling_tpu.data.example import generate_example_dataset
from nerf_sampling_tpu.utils.config import TrainerConfig


@pytest.fixture
def imageio():
    import imageio.v2 as imageio

    return imageio


class TestBlender:
    def test_roundtrip_example_dataset(self, tmp_path):
        d = generate_example_dataset(
            str(tmp_path / "b"), H=16, W=16, n_train=3, n_val=1, n_test=2
        )
        scene = load_blender_data(d, half_res=False, testskip=1)
        assert scene.images.shape == (6, 16, 16, 4)
        assert scene.poses.shape == (6, 4, 4)
        assert scene.render_poses.shape == (40, 4, 4)
        assert len(scene.i_train) == 3 and len(scene.i_test) == 2
        H, W, focal = scene.hwf
        assert (H, W) == (16, 16) and focal > 0
        scene.composite_white_background()
        assert scene.images.shape[-1] == 3

    def test_half_res_and_testskip(self, tmp_path):
        d = generate_example_dataset(
            str(tmp_path / "b"), H=16, W=16, n_train=3, n_val=1, n_test=4
        )
        scene = load_blender_data(d, half_res=True, testskip=2)
        assert scene.images.shape[1:3] == (8, 8)
        assert len(scene.i_test) == 2  # every 2nd test frame
        assert scene.hwf[2] == pytest.approx(
            load_blender_data(d, False, 1).hwf[2] / 2
        )


class TestLLFF:
    def _make_llff(self, root, n=6, H=32, W=40):
        import imageio.v2 as imageio

        rng = np.random.default_rng(0)
        imgdir = os.path.join(root, "images")
        os.makedirs(imgdir)
        for i in range(n):
            imageio.imwrite(
                os.path.join(imgdir, f"img_{i:03d}.png"),
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
            )
        # forward-facing-ish camera ring; poses_bounds rows: [R|t|hwf] + bds
        poses = []
        for i in range(n):
            th = 0.05 * i
            c2w = np.array(
                [
                    [np.cos(th), 0, -np.sin(th), 0.1 * i],
                    [0, 1, 0, 0.02 * i],
                    [np.sin(th), 0, np.cos(th), 0.01 * i],
                ]
            )
            # llff convention stores [down right back]: invert our reorder
            m = np.concatenate(
                [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:]], 1
            )  # 3x5 after hwf
            hwf = np.array([[H], [W], [50.0]])
            poses.append(np.concatenate([m, hwf], 1).reshape(-1))
        bds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], -1)
        arr = np.concatenate([np.stack(poses), bds], -1)
        np.save(os.path.join(root, "poses_bounds.npy"), arr)
        return root

    def test_load_scene_ndc(self, tmp_path):
        from nerf_sampling_tpu.data.llff import load_llff_scene

        root = self._make_llff(str(tmp_path))
        cfg = TrainerConfig(dataset_type="llff", datadir=root, factor=2, llffhold=3)
        scene = load_llff_scene(cfg)
        assert scene.images.shape[0] == 6
        assert scene.images.shape[1:3] == (16, 20)  # minified by 2
        assert scene.poses.shape == (6, 3, 4)
        assert scene.render_poses.shape[1:] == (3, 4)
        assert (scene.near, scene.far) == (0.0, 1.0)  # NDC bounds
        assert len(scene.i_test) == 2  # every 3rd of 6
        assert len(scene.i_train) == 4
        # minified cache directory created
        assert os.path.isdir(os.path.join(root, "images_2"))

    def test_load_scene_no_ndc_spherify(self, tmp_path):
        from nerf_sampling_tpu.data.llff import load_llff_scene

        root = self._make_llff(str(tmp_path))
        cfg = TrainerConfig(
            dataset_type="llff", datadir=root, factor=2, llffhold=0,
            no_ndc=True, spherify=True,
        )
        scene = load_llff_scene(cfg)
        assert scene.near > 0 and scene.far > scene.near  # bds-derived
        assert scene.render_poses.shape == (120, 3, 4)

    def test_procedural_llff_scene_roundtrip(self, tmp_path):
        """The procedural forward-facing generator writes the EXACT on-disk
        format load_llff.py:67-76 reads; the loader must recover sane
        geometry: finite orthonormal poses, forward-looking cameras
        (pre-recenter), z-depth bounds spanning the analytic content
        (~[2, 10.5] before rescale), NDC near/far, and images with real
        content. This is the scene the NDC convergence runs train on."""
        from nerf_sampling_tpu.data.example import generate_example_llff_dataset
        from nerf_sampling_tpu.data.llff import load_llff_data, load_llff_scene

        root = generate_example_llff_dataset(
            str(tmp_path / "llff"), H=40, W=40, n_images=9
        )
        pb = np.load(os.path.join(root, "poses_bounds.npy"))
        assert pb.shape == (9, 17)
        assert 1.5 < pb[:, -2].min() < 2.5  # near ~ closest content z-depth
        assert 8.0 < pb[:, -1].max() < 12.0  # far ~ backdrop z-depth

        # pre-recenter poses: rotation orthonormal, cameras near the z=0
        # plane looking down -z (back column ~ +z)
        images, poses, bds, _rp, _it = load_llff_data(
            root, factor=1, recenter=False, bd_factor=None
        )
        R = poses[:, :3, :3]
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (9, 1, 1)),
            atol=1e-5,
        )
        assert (R[:, 2, 2] > 0.95).all()  # back ~ +z: forward-facing
        assert np.abs(poses[:, 2, 3]).max() < 0.15  # eyes near z=0

        cfg = TrainerConfig(
            dataset_type="llff", datadir=root, factor=1, llffhold=8
        )
        scene = load_llff_scene(cfg)
        assert (scene.near, scene.far) == (0.0, 1.0)
        assert scene.images.shape == (9, 40, 40, 3)
        assert scene.images.std() > 0.05
        assert np.isfinite(scene.poses).all()

    def test_procedural_linemod_scene_roundtrip(self, tmp_path):
        """Procedural LINEMOD-format scene: per-frame intrinsic_matrix,
        metadata near/far floors/ceils (load_LINEMOD.py:45-107)."""
        from nerf_sampling_tpu.data.example import (
            generate_example_linemod_dataset,
        )
        from nerf_sampling_tpu.data.linemod import load_linemod_scene

        root = generate_example_linemod_dataset(
            str(tmp_path / "lm"), H=32, W=32, n_train=3, n_val=1, n_test=1
        )
        cfg = TrainerConfig(
            dataset_type="LINEMOD", datadir=root, half_res=False,
            testskip=1, white_bkgd=True,
        )
        scene = load_linemod_scene(cfg)
        assert scene.images.shape == (5, 32, 32, 3)  # white-composited
        assert (scene.near, scene.far) == (2.0, 6.0)  # floor(2.2)/ceil(5.8)
        assert scene.K is not None and scene.K[0, 0] > 0
        assert scene.images.std() > 0.05

    def test_procedural_deepvoxels_scene_roundtrip(self, tmp_path):
        """Procedural DeepVoxels-format scene: intrinsics.txt + pose dirs,
        diag(1,-1,-1,1) pose convention, hemisphere near/far
        (load_deepvoxels.py:6-134, deepvoxels.py:44-58)."""
        from nerf_sampling_tpu.data.example import (
            generate_example_deepvoxels_dataset,
        )
        from nerf_sampling_tpu.data.deepvoxels import load_deepvoxels_scene

        root = generate_example_deepvoxels_dataset(
            str(tmp_path / "dv"), n_train=2, n_val=1, n_test=1
        )
        cfg = TrainerConfig(
            dataset_type="deepvoxels", datadir=root, shape="cube", testskip=1
        )
        scene = load_deepvoxels_scene(cfg)
        assert scene.images.shape == (4, 512, 512, 3)
        assert abs(scene.near - 3.0) < 0.05 and abs(scene.far - 5.0) < 0.05
        # stored pose convention round-trips to orbit cameras at radius 4
        # looking at the origin (back axis ~ +eye direction)
        eyes = scene.poses[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(eyes, axis=-1), 4.0, atol=1e-4)
        back = scene.poses[:, :3, 2]
        cos = np.sum(back * eyes / 4.0, -1)
        assert (cos > 0.999).all()
        assert scene.images.std() > 0.05


class TestLinemod:
    def _make(self, root, H=20, W=20):
        import imageio.v2 as imageio

        rng = np.random.default_rng(0)
        os.makedirs(root)
        K = [[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]
        for s, n in (("train", 3), ("val", 1), ("test", 2)):
            frames = []
            os.makedirs(os.path.join(root, s))
            for i in range(n):
                rel = f"{s}/{i}.png"
                imageio.imwrite(
                    os.path.join(root, rel),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
                )
                frames.append(
                    {
                        "file_path": rel,
                        "transform_matrix": np.eye(4).tolist(),
                        "intrinsic_matrix": K,
                    }
                )
            meta = {"frames": frames, "near": 1.3, "far": 5.6}
            with open(os.path.join(root, f"transforms_{s}.json"), "w") as f:
                json.dump(meta, f)
        return root

    def test_load_scene(self, tmp_path):
        from nerf_sampling_tpu.data.linemod import load_linemod_scene

        root = self._make(str(tmp_path / "lm"))
        cfg = TrainerConfig(
            dataset_type="LINEMOD", datadir=root, half_res=False, testskip=1,
            white_bkgd=False,
        )
        scene = load_linemod_scene(cfg)
        assert scene.images.shape == (6, 20, 20, 3)
        # near/far floors/ceils (reference load_LINEMOD.py:105-106)
        assert scene.near == 1.0 and scene.far == 6.0
        assert scene.K is not None and scene.K[0][0] == 40.0
        assert scene.render_poses.shape == (40, 4, 4)


class TestDeepVoxels:
    def _make(self, root, scene="greek", H=16):
        import imageio.v2 as imageio

        rng = np.random.default_rng(0)
        for split, n in (("train", 4), ("validation", 2), ("test", 2)):
            base = os.path.join(root, split, scene)
            os.makedirs(os.path.join(base, "pose"))
            os.makedirs(os.path.join(base, "rgb"))
            for i in range(n):
                pose = np.eye(4)
                pose[:3, 3] = [0, 0, 2.0 + 0.1 * i]
                np.savetxt(
                    os.path.join(base, "pose", f"{i:03d}.txt"),
                    pose.reshape(1, -1),
                )
                imageio.imwrite(
                    os.path.join(base, "rgb", f"{i:03d}.png"),
                    rng.integers(0, 255, (H, H, 3), dtype=np.uint8),
                )
            if split == "train":
                with open(os.path.join(base, "intrinsics.txt"), "w") as f:
                    f.write(f"{H * 2.0} {H / 2} {H / 2}\n")
                    f.write("0 0 0\n")  # grid barycenter
                    f.write("1.0\n")  # near plane
                    f.write("1.0\n")  # scale
                    f.write(f"{H} {H}\n")
                    f.write("0\n")
        return root

    def test_load_scene(self, tmp_path):
        from nerf_sampling_tpu.data.deepvoxels import load_deepvoxels_scene

        root = self._make(str(tmp_path / "dv"))
        cfg = TrainerConfig(
            dataset_type="deepvoxels", datadir=root, shape="greek", testskip=1
        )
        scene = load_deepvoxels_scene(cfg)
        assert scene.images.shape[0] == 8
        assert scene.hwf[0] == 512  # deepvoxels fixed target res
        assert scene.far - scene.near == pytest.approx(2.0)  # hemisphere +-1
        assert len(scene.i_train) == 4
