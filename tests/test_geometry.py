import math

import numpy as np
import pytest

from navillm_tpu.sim import geometry as G


def test_angle_feature_scalar():
    f = G.angle_feature(0.0, 0.0, 4)
    np.testing.assert_allclose(f, [0.0, 1.0, 0.0, 1.0], atol=1e-7)
    f = G.angle_feature(math.pi / 2, -math.pi / 2, 4)
    np.testing.assert_allclose(f, [1.0, 0.0, -1.0, 0.0], atol=1e-7)


def test_angle_feature_tiling():
    f = G.angle_feature(0.3, -0.2, 8)
    assert f.shape == (8,)
    np.testing.assert_allclose(f[:4], f[4:])


def test_all_point_angle_features_matches_reference_formula():
    """Reference computes these by stepping the simulator through all 36
    views (mp3d_envs.py:42-66); check the closed form agrees."""
    table = G.all_point_angle_features(4)
    assert table.shape == (36, 36, 4)
    for base in (0, 7, 23, 35):
        bh = (base % 12) * G.RAD30
        be = (base // 12 - 1) * G.RAD30
        for ix in (0, 5, 12, 30):
            h = (ix % 12) * G.RAD30 - bh
            e = (ix // 12 - 1) * G.RAD30 - be
            expect = [math.sin(h), math.cos(h), math.sin(e), math.cos(e)]
            np.testing.assert_allclose(table[base, ix], expect, atol=1e-6)


def test_rel_heading_elevation_dist_quadrants():
    a = np.zeros(3)
    # +x direction -> heading pi/2 (the simulator's transposed-axis frame)
    h, e, d = G.rel_heading_elevation_dist(a, np.array([1.0, 0.0, 0.0]))
    assert abs(h - math.pi / 2) < 1e-7 and abs(e) < 1e-6 and abs(d - 1) < 1e-7
    # +y direction -> heading 0
    h, _, _ = G.rel_heading_elevation_dist(a, np.array([0.0, 1.0, 0.0]))
    assert abs(h) < 1e-6
    # -y direction -> heading pi (pi - arcsin(0) with dy<0)
    h, _, _ = G.rel_heading_elevation_dist(a, np.array([0.0, -1.0, 0.0]))
    assert abs(h - math.pi) < 1e-6
    # up -> elevation pi/2
    _, e, _ = G.rel_heading_elevation_dist(a, np.array([0.0, 0.0, 2.0]))
    assert abs(e - math.pi / 2) < 1e-6


def test_rel_heading_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    a = rng.normal(size=3)
    bs = rng.normal(size=(10, 3))
    hv, ev, dv = G.rel_heading_elevation_dist(a, bs, 0.5, -0.2)
    for i in range(10):
        h, e, d = G.rel_heading_elevation_dist(a, bs[i], 0.5, -0.2)
        assert abs(h - hv[i]) < 1e-9 and abs(e - ev[i]) < 1e-9 and abs(d - dv[i]) < 1e-9


def test_rel_pos_features_shape_and_normalization():
    cur = np.zeros(3)
    nodes = np.array([[3.0, 0, 0], [0, 15.0, 0]])
    f = G.rel_pos_features(cur, nodes, graph_dist=[3.0, 21.0],
                           graph_steps=[1, 4], base_heading=0.0,
                           base_elevation=0.0)
    assert f.shape == (2, 7)
    np.testing.assert_allclose(f[0, 4:], [0.1, 0.1, 0.1], atol=1e-6)
    np.testing.assert_allclose(f[1, 4:], [0.5, 0.7, 0.4], atol=1e-6)


def test_heading_elevation_normalizers():
    assert abs(G.convert_heading(2 * math.pi + 0.5) - 0.5 / (2 * math.pi)) < 1e-9
    assert abs(G.convert_elevation(0.0) - 0.5) < 1e-9
    assert abs(G.normalize_angle(3 * math.pi) - math.pi) < 1e-9
    assert abs(G.normalize_angle(-0.1) - (-0.1)) < 1e-9
