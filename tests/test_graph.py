import numpy as np
import pytest

from navillm_tpu.sim import (ScanGraph, EpisodeGraph, WorldModel, EpisodeBatch,
                             load_connectivity, native_available, discretize)
from navillm_tpu.sim.geometry import RAD30


def test_native_library_builds():
    assert native_available(), "C++ navsim library failed to build"


def test_connectivity_loading(world_dir):
    ids, pos, edges, w = load_connectivity(world_dir, "scan0")
    assert len(ids) == 16
    assert edges.shape == (24, 2)          # 4x4 grid: 2*4*3 edges
    np.testing.assert_allclose(w, 2.0)


def test_scan_graph_distances(world):
    g = world.graph("scan0")
    assert g.distance("vp_0_0", "vp_0_0") == 0
    assert abs(g.distance("vp_0_0", "vp_3_3") - 12.0) < 1e-9  # manhattan * 2
    p = g.path("vp_0_0", "vp_0_3")
    assert p[0] == "vp_0_0" and p[-1] == "vp_0_3" and len(p) == 4


def test_scan_graph_with_dropped_edges(world):
    g = world.graph("scan1")
    # (0,1)-(0,2) dropped: path must detour through row 1
    assert abs(g.distance("vp_0_1", "vp_0_2") - 6.0) < 1e-9
    p = g.path("vp_0_1", "vp_0_2")
    assert len(p) == 4


def test_scan_graph_native_matches_numpy(world_dir):
    args = load_connectivity(world_dir, "scan1")
    g_native = ScanGraph(*args)
    g_numpy = ScanGraph(*args)
    g_numpy._h = None
    g_numpy._dist, g_numpy._next = g_numpy._all_pairs_numpy(args[2], args[3])
    np.testing.assert_allclose(g_native.distance_matrix(), g_numpy._dist)
    for a in g_native.ids[::3]:
        for b in g_native.ids[::4]:
            pa, pb = g_native.path(a, b), g_numpy.path(a, b)
            # paths may differ on ties; lengths must match
            da = sum(g_native.distance(x, y) for x, y in zip(pa, pa[1:]))
            db = sum(g_native.distance(x, y) for x, y in zip(pb, pb[1:]))
            assert abs(da - db) < 1e-9


def _run_episode_graph(ep):
    # Discover a triangle with a shortcut that only appears after update()
    ep.add_edge("a", "b", 1.0)
    ep.add_edge("b", "c", 1.0)
    assert ep.distance("a", "c") == float("inf")  # b not yet visited
    ep.update("b")
    assert abs(ep.distance("a", "c") - 2.0) < 1e-9
    assert ep.path("a", "c") == ["b", "c"]   # excludes start (reference semantics)
    ep.add_edge("a", "c", 1.5)
    assert abs(ep.distance("a", "c") - 1.5) < 1e-9
    assert ep.path("a", "c") == ["c"]
    assert ep.visited("b") and not ep.visited("a")
    m = ep.pair_distances(["a", "b", "c"])
    np.testing.assert_allclose(m, [[0, 1, 1.5], [1, 0, 1], [1.5, 1, 0]])


def test_episode_graph_native():
    _run_episode_graph(EpisodeGraph(capacity=16))


def test_episode_graph_numpy_fallback():
    ep = EpisodeGraph(capacity=16)
    if ep._h is not None:
        import numpy as np
        ep._h = None
        ep._dist = np.full((16, 16), float("inf"))
        np.fill_diagonal(ep._dist, 0.0)
        ep._mid = np.full((16, 16), -1, dtype=np.int32)
        ep._visited = np.zeros(16, dtype=bool)
    _run_episode_graph(ep)


def test_episode_graph_matches_reference_floyd_semantics(world):
    """Walk a path in scan0 updating each visited node; distances between
    any two discovered nodes must match true shortest paths restricted to
    the visited-relay rule."""
    g = world.graph("scan0")
    ep = EpisodeGraph(capacity=64)
    walk = ["vp_0_0", "vp_0_1", "vp_1_1", "vp_1_2"]
    for vp in walk:
        for cand in world.candidates("scan0", vp):
            ep.add_edge(vp, cand.viewpoint_id, g.distance(vp, cand.viewpoint_id))
        ep.update(vp)
    # all-visited chain: distances along discovered subgraph equal true dist
    assert abs(ep.distance("vp_0_0", "vp_1_2") - g.distance("vp_0_0", "vp_1_2")) < 1e-9
    path = ep.path("vp_0_0", "vp_1_2")
    assert path[-1] == "vp_1_2" and len(path) == 3


def test_discretize():
    assert discretize(0.0, 0.0) == (12, 0.0, 0.0)
    vi, h, e = discretize(RAD30 * 3 + 0.01, RAD30)
    assert vi == 24 + 3
    vi, _, _ = discretize(-RAD30, 0.0)   # wraps to heading 11
    assert vi == 12 + 11


def test_episode_batch(world):
    eb = EpisodeBatch(world, batch_size=2)
    eb.new_episodes(["scan0", "scan1"], ["vp_0_0", "vp_1_2"], [0.0, RAD30 * 2])
    s = eb.get_states()
    assert s[0].viewpoint == "vp_0_0" and s[0].view_index == 12
    assert s[1].view_index == 14
    cands = eb.candidates(0)
    assert {c.viewpoint_id for c in cands} == {"vp_0_1", "vp_1_0"}
    # step to a neighbor facing its point_id
    target = cands[0]
    eb.teleport(0, target.viewpoint_id, target.point_id)
    assert eb.get_states()[0].viewpoint == target.viewpoint_id


def test_candidate_point_ids_are_best_views(world):
    # neighbor to the east (+x) => heading pi/2 => view 3 at horizon = 15
    cands = world.candidates("scan0", "vp_1_1")
    by_vp = {c.viewpoint_id: c for c in cands}
    assert by_vp["vp_1_2"].point_id == 15
    assert by_vp["vp_0_1"].point_id in (12 + 6, 18)    # -y => heading pi => view 6
    assert by_vp["vp_2_1"].point_id == 12              # +y => heading 0
    assert by_vp["vp_1_0"].point_id == 12 + 9          # -x => heading 3pi/2
