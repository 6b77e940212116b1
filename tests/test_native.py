"""Native point-generation library (native/libpointgen.so) vs NumPy fallbacks."""

import os
import numpy as np
import pytest

from nsfnet_tpu.data import native
from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.data.sampling import (
    boundary_distance_box,
    min_distance_to_points,
    sort_by_boundary_distance,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libpointgen.so not built (make -C native)")


def test_lh_sample_stratified_and_bounded():
    s = native.lh_sample(64, [[0.0, 1.0], [-2.0, 2.0]], seed=7)
    assert s.shape == (64, 2)
    counts = np.histogram(s[:, 0], bins=64, range=(0, 1))[0]
    assert np.all(counts == 1)
    assert s[:, 1].min() >= -2 and s[:, 1].max() <= 2
    # deterministic in the seed
    np.testing.assert_array_equal(s, native.lh_sample(64, [[0.0, 1.0], [-2.0, 2.0]], seed=7))


def test_min_distance_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (500, 2))
    ref = rng.uniform(0, 1, (200, 2))
    got = native.min_distance(pts, ref)
    exp = min_distance_to_points(pts, ref)
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_sdf_weights_match_python():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (1000, 2))
    got = native.sdf_weights(pts, 0.0, 1.0, 0.2, 5.0)
    d = boundary_distance_box(pts)
    w = 0.2 + 0.8 * np.exp(-5.0 * d)
    exp = (w / w.mean()).astype(np.float32)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_sort_matches_python():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, (300, 2))
    ref = rng.uniform(0, 1, (100, 2))
    got = native.sort_by_distance(pts, ref)
    exp = sort_by_boundary_distance(pts, ref)
    np.testing.assert_allclose(got, exp)


def test_cavity_data_native_vs_python_paths():
    """Both paths produce valid datasets with identical statistics contracts."""
    for use_native in (True, False):
        data = CavityData(N_f=500, sort_training_points=True, sdf_enabled=True,
                          seed=3, use_native=use_native)
        data.boundary_data()
        x, y = data.training_data()
        assert x.shape == (500, 1)
        assert 0 <= x.min() and x.max() <= 1
        np.testing.assert_allclose(data.sdf_weights.mean(), 1.0, rtol=1e-5)
        pts = np.concatenate([x, y], axis=1).astype(np.float64)
        d = min_distance_to_points(pts, data.pts_bc)
        assert np.all(np.diff(d) >= -1e-9)  # sorted by boundary distance


def test_packaged_native_build_and_env_override(tmp_path):
    """`python setup.py build_native` compiles the ctypes library into
    nsfnet_tpu/_native/ and the loader honors NSFNET_POINTGEN_LIB."""
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if shutil.which("g++") is None and shutil.which("clang++") is None:
        pytest.skip("no C++ toolchain")
    r = subprocess.run([sys.executable, "setup.py", "build_native"],
                       cwd=repo, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
    built = os.path.join(repo, "nsfnet_tpu", "_native", "libpointgen.so")
    assert os.path.exists(built)

    # env override wins over both search-path copies
    probe = (
        "import os\n"
        f"os.environ['NSFNET_POINTGEN_LIB'] = {built!r}\n"
        "from nsfnet_tpu.data import native\n"
        f"assert native._find_lib() == {built!r}\n"
        "assert native.available()\n"
        "print('OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", probe], cwd=repo,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-1000:]
