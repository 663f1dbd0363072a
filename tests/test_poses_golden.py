"""core/poses.py vs the reference's own numpy implementation, run directly.

The reference's load_llff.py pose math is pure numpy (itself inherited from
the LLFF project — see core/poses.py attribution), so the strongest parity
check is to import it from /root/reference and compare outputs bit-for-bit
on random pose sets. Skips cleanly if the reference tree is absent.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from nerf_sampling_tpu.core import poses as ours

_REF = "/root/reference/nerf_sampling/nerf_pytorch/load_llff.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(_REF):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_load_llff", _REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_load_llff"] = mod
    spec.loader.exec_module(mod)
    return mod


def random_poses(n=12, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        # random rotation via QR + random translation + hwf column
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.uniform(-2, 2, (3, 1))
        hwf = np.array([[400.0], [400.0], [555.0]])
        out.append(np.concatenate([q, t, hwf], 1))
    return np.stack(out).astype(np.float64)


class TestPosesGolden:
    def test_poses_avg(self, ref):
        p = random_poses()
        np.testing.assert_allclose(ours.poses_avg(p), ref.poses_avg(p), rtol=1e-12)

    def test_recenter_poses(self, ref):
        p = random_poses(seed=1)
        np.testing.assert_allclose(
            ours.recenter_poses(p), ref.recenter_poses(p), rtol=1e-12
        )

    def test_render_path_spiral(self, ref):
        p = random_poses(seed=2)
        c2w = ours.poses_avg(p)
        up = ours.normalize(p[:, :3, 1].sum(0))
        rads = np.percentile(np.abs(p[:, :3, 3]), 90, 0)
        a = ours.render_path_spiral(c2w, up, rads, focal=2.5, zrate=0.5, rots=2, N=30)
        b = ref.render_path_spiral(
            c2w, up, rads, focal=2.5, zdelta=0.1, zrate=0.5, rots=2, N=30
        )
        np.testing.assert_allclose(np.stack(a), np.stack(b), rtol=1e-12)

    def test_spherify_poses(self, ref):
        p = random_poses(n=16, seed=3)
        bds = np.abs(np.random.default_rng(3).uniform(1, 8, (16, 2)))
        pa, na, ba = ours.spherify_poses(p.copy(), bds.copy())
        pb, nb, bb = ref.spherify_poses(p.copy(), bds.copy())
        np.testing.assert_allclose(pa, pb, rtol=1e-10)
        np.testing.assert_allclose(na, nb, rtol=1e-10)
        np.testing.assert_allclose(ba, bb, rtol=1e-10)

    def test_viewmatrix(self, ref):
        rng = np.random.default_rng(4)
        z, up, pos = rng.standard_normal((3, 3))
        np.testing.assert_allclose(
            ours.viewmatrix(z, up, pos), ref.viewmatrix(z, up, pos), rtol=1e-12
        )
