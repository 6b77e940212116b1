"""Cavity dataset generation: boundary set, lid profile, LHS, SDF, transform."""

import numpy as np

from nsfnet_tpu.data.cavity import CavityData, lid_velocity
from nsfnet_tpu.data.sampling import (
    boundary_distance_box,
    latin_hypercube,
    min_distance_to_points,
    sort_by_boundary_distance,
)


def test_boundary_counts_and_values():
    """2052 boundary points: 513/edge (cavity_data.py:49-66)."""
    data = CavityData(N_f=100, seed=0)
    x_b, y_b, u_b, v_b = data.boundary_data()
    assert x_b.shape == (4 * 513, 1)
    assert np.all(v_b == 0)
    # bottom/left/right no-slip
    bottom = u_b[:513]
    assert np.all(bottom == 0)
    # lid: regularized profile, ~0 at corners, max near 1 mid-lid
    lid = u_b[513:1026, 0]
    assert abs(lid[0]) < 1e-6 and abs(lid[-1]) < 1e-6
    assert 0.98 < lid[256] <= 1.0


def test_lid_profile_formula():
    x = np.linspace(0, 1, 11)
    expected = 1 - np.cosh(10 * (x - 0.5)) / np.cosh(5.0)
    np.testing.assert_allclose(lid_velocity(x), expected)


def test_latin_hypercube_stratification():
    """Exactly one sample per stratum per dimension."""
    n = 50
    s = latin_hypercube(n, [[0.0, 1.0], [0.0, 1.0]], np.random.default_rng(0))
    assert s.shape == (n, 2)
    for d in range(2):
        counts = np.histogram(s[:, d], bins=n, range=(0, 1))[0]
        assert np.all(counts == 1)


def test_latin_hypercube_bounds():
    s = latin_hypercube(100, [[-1.0, 1.0], [2.0, 3.0]], np.random.default_rng(1))
    assert s[:, 0].min() >= -1 and s[:, 0].max() <= 1
    assert s[:, 1].min() >= 2 and s[:, 1].max() <= 3


def test_training_data_requires_boundary_first():
    data = CavityData(N_f=10, seed=0)
    try:
        data.training_data()
        assert False, "should require boundary data first"
    except RuntimeError:
        pass


def test_sdf_weights_mean_normalized_and_shapes():
    data = CavityData(N_f=500, sdf_enabled=True, sort_training_points=False, seed=0)
    data.boundary_data()
    x_f, y_f = data.training_data()
    w = data.sdf_weights
    assert x_f.shape == (500, 1) and w.shape == (500,)
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)
    # near-boundary points get larger weights
    pts = np.concatenate([x_f, y_f], axis=1)
    d = boundary_distance_box(pts)
    assert w[np.argmin(d)] > w[np.argmax(d)]


def test_boundary_distance_box_matches_discrete():
    """Closed-form box distance == KD-style min distance to the 2052
    boundary points, up to half the boundary spacing."""
    data = CavityData(N_f=50, seed=0)
    data.boundary_data()
    pts = latin_hypercube(200, [[0, 1], [0, 1]], np.random.default_rng(2))
    exact = boundary_distance_box(pts)
    discrete = min_distance_to_points(pts, data.pts_bc)
    assert np.max(np.abs(exact - discrete)) < 1.0 / 512


def test_sorting_by_distance():
    data = CavityData(N_f=50, seed=0)
    data.boundary_data()
    pts = latin_hypercube(100, [[0, 1], [0, 1]], np.random.default_rng(3))
    srt = sort_by_boundary_distance(pts, data.pts_bc)
    d = min_distance_to_points(srt, data.pts_bc)
    assert np.all(np.diff(d) >= -1e-12)


def test_coord_transform():
    data = CavityData(N_f=100, coord_transform=True, sort_training_points=False, seed=0)
    x_b, y_b, _, _ = data.boundary_data()
    assert x_b.min() == -1.0 and x_b.max() == 1.0
    x_f, y_f = data.training_data()
    assert x_f.min() >= -1 and x_f.max() <= 1
    assert data.coord_scale == 2.0


def test_boundary_data_idempotent_with_transform():
    # regression: boundary_data() used to mutate the domain bounds on the
    # first transformed call, corrupting a second call's points
    d = CavityData(N_f=64, coord_transform=True,
                   sort_training_points=False, seed=0)
    first = d.boundary_data()
    second = d.boundary_data()
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    assert float(first[0].min()) == -1.0 and float(first[0].max()) == 1.0


def test_repeated_training_data_draws_fresh_points():
    # per-stage resampling relies on each call producing a NEW sample —
    # the native path used to reuse its fixed seed and return clones
    for use_native in (True, False):
        d = CavityData(N_f=128, sort_training_points=False, seed=3,
                       use_native=use_native)
        d.boundary_data()
        x1, y1 = d.training_data()
        x2, y2 = d.training_data()
        assert not np.allclose(x1, x2)
        # reproducibility: a fresh loader with the same seed repeats draw 1
        d2 = CavityData(N_f=128, sort_training_points=False, seed=3,
                        use_native=use_native)
        d2.boundary_data()
        x1b, _ = d2.training_data()
        np.testing.assert_array_equal(x1, x1b)


def test_sampler_state_roundtrip_replays_draw_sequence():
    # SURVEY §5.4: sampler state in checkpoint metadata — restoring the
    # state as of draw k must replay draw k bit-exactly and continue the
    # stream identically (watchdog resume mid-resample-campaign)
    import json

    for use_native in (True, False):
        d = CavityData(N_f=96, sort_training_points=False, seed=11,
                       use_native=use_native)
        d.boundary_data()
        d.training_data()               # draw 0
        x2, y2 = d.training_data()      # draw 1  <- "current" points
        state = d.get_state()
        state = json.loads(json.dumps(state))  # must survive the JSON sidecar
        x3, y3 = d.training_data()      # draw 2

        d2 = CavityData(N_f=96, sort_training_points=False, seed=None,
                        use_native=use_native)
        d2.boundary_data()
        d2.set_state(state)
        x2b, y2b = d2.training_data()   # replays draw 1
        x3b, y3b = d2.training_data()   # continues to draw 2
        np.testing.assert_array_equal(x2, x2b)
        np.testing.assert_array_equal(y2, y2b)
        np.testing.assert_array_equal(x3, x3b)
        np.testing.assert_array_equal(y3, y3b)


def test_sampler_state_numpy_stream_replays_on_native_host():
    # Regression: a campaign started before native/ was built records
    # native=False in its sampler state; after a reboot the watchdog host
    # rebuilds libpointgen.so and resumes. set_state must force the dataset
    # back onto the numpy path (replaying the identical stream) instead of
    # raising — the hard error crash-looped an unattended Re=4000 campaign
    # for ~1.3 h on 2026-08-20.
    import json

    writer = CavityData(N_f=96, sort_training_points=False, seed=7,
                        use_native=False)
    writer.boundary_data()
    x1, y1 = writer.training_data()
    state = json.loads(json.dumps(writer.get_state()))
    assert state["native"] is False
    x2, y2 = writer.training_data()

    reader = CavityData(N_f=96, sort_training_points=False, seed=None,
                        use_native=True)  # host WOULD use native if built
    reader.boundary_data()
    reader.set_state(state)               # must not raise
    assert reader.use_native is False     # honors the writer's path
    x1b, y1b = reader.training_data()
    x2b, y2b = reader.training_data()
    np.testing.assert_array_equal(x1, x1b)
    np.testing.assert_array_equal(y1, y1b)
    np.testing.assert_array_equal(x2, x2b)
    np.testing.assert_array_equal(y2, y2b)

    # The reverse direction (recorded native, native unavailable) stays a
    # hard error — numpy cannot replicate the native stream.
    from nsfnet_tpu.data import native as native_mod
    if native_mod.available():
        w2 = CavityData(N_f=96, sort_training_points=False, seed=7,
                        use_native=True)
        w2.boundary_data()
        w2.training_data()
        s2 = json.loads(json.dumps(w2.get_state()))
        assert s2["native"] is True
        r2 = CavityData(N_f=96, sort_training_points=False, seed=None,
                        use_native=False)
        r2.boundary_data()
        import pytest
        with pytest.raises(RuntimeError, match="native sampling path"):
            r2.set_state(s2)


def _twin_pool(seed, N_f, pool_mult, use_native):
    """Reconstruct the candidate pool a fresh loader's first RAR draw sees:
    raw draws are keyed only on (seed, draw counter), so a twin loader's
    _raw_draw at counter 0 is bit-identical."""
    t = CavityData(N_f=N_f, sort_training_points=False, seed=seed,
                   use_native=use_native)
    t.boundary_data()
    return t._raw_draw(pool_mult * N_f)


def test_rar_keeps_highest_scored_pool_points():
    # RAR draw = [pool points with the largest score_fn | fresh uniform
    # fill]; with sorting off the kept block leads the output verbatim
    from nsfnet_tpu.data import native as native_mod

    for use_native in (True, False):
        if use_native and not native_mod.available():
            continue
        N_f, pool_mult, top_frac = 64, 3, 0.5
        d = CavityData(N_f=N_f, sort_training_points=False, seed=5,
                       coord_transform=True, use_native=use_native)
        d.boundary_data()
        score = lambda x, y: (x + y).reshape(-1)  # favors top-right corner
        x, y = d.rar_training_data(score, pool_mult=pool_mult,
                                   top_frac=top_frac)
        assert x.shape == (N_f, 1) and y.shape == (N_f, 1)

        pool = _twin_pool(5, N_f, pool_mult, use_native)
        centered = pool * 2.0 - 1.0  # coord_transform frame
        s = (centered[:, 0] + centered[:, 1])
        keep_n = round(top_frac * N_f)
        expect_idx = np.sort(np.argpartition(-s, keep_n - 1)[:keep_n])
        np.testing.assert_array_equal(
            x[:keep_n, 0], centered[expect_idx, 0].astype(np.float32))
        np.testing.assert_array_equal(
            y[:keep_n, 0], centered[expect_idx, 1].astype(np.float32))
        # fill points are inside the domain and fresh (not from the pool)
        assert np.all(np.abs(x[keep_n:]) <= 1.0)
        assert x[keep_n:].shape[0] == N_f - keep_n


def test_rar_state_roundtrip_replays_without_scores():
    # The kept-point indices ride in sampler state: a resume replays the
    # residual-aware mixed set through a PLAIN training_data() call — no
    # score function (the writer's mid-campaign params are gone), and the
    # stream continues identically afterwards
    import json

    from nsfnet_tpu.data import native as native_mod

    for use_native in (True, False):
        if use_native and not native_mod.available():
            continue
        d = CavityData(N_f=96, sort_training_points=False, seed=11,
                       use_native=use_native)
        d.boundary_data()
        d.training_data()  # draw 0: plain
        score = lambda x, y: np.hypot(x, y).reshape(-1)
        x1, y1 = d.rar_training_data(score, pool_mult=2, top_frac=0.25)
        state = json.loads(json.dumps(d.get_state()))  # JSON sidecar trip
        x2, y2 = d.training_data()  # draw 2: plain, continues the stream

        d2 = CavityData(N_f=96, sort_training_points=False, seed=None,
                        use_native=use_native)
        d2.boundary_data()
        d2.set_state(state)
        x1b, y1b = d2.training_data()  # replays the RAR draw, scoreless
        # get_state() as of the replayed draw re-records the same spec (a
        # second-generation resume still replays the residual-aware set)
        again = json.loads(json.dumps(d2.get_state()))
        assert again["rar"] == state["rar"]
        x2b, y2b = d2.training_data()  # continues to draw 2
        np.testing.assert_array_equal(x1, x1b)
        np.testing.assert_array_equal(y1, y1b)
        np.testing.assert_array_equal(x2, x2b)
        np.testing.assert_array_equal(y2, y2b)


def test_rar_argument_validation():
    import pytest

    d = CavityData(N_f=32, sort_training_points=False, seed=0,
                   use_native=False)
    d.boundary_data()
    score = lambda x, y: np.zeros(x.shape[0])
    with pytest.raises(ValueError):
        d.rar_training_data(score, pool_mult=0)
    with pytest.raises(ValueError):
        d.rar_training_data(score, pool_mult=2, top_frac=0.0)
    with pytest.raises(ValueError):
        d.rar_training_data(score, pool_mult=2, top_frac=1.5)
    with pytest.raises(ValueError):
        d.rar_training_data(lambda x, y: np.zeros(3), pool_mult=2)
