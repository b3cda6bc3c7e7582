"""GraphMap — per-episode topological memory semantics
(reference models/graph_utils.py:99-185)."""
import numpy as np

from navillm_tpu.agents.graph_map import GraphMap
from navillm_tpu.sim.geometry import MAX_DIST, MAX_STEP


def _ob(vp, pos, cands):
    return {"viewpoint": vp, "position": np.asarray(pos, np.float64),
            "candidate": [{"viewpointId": cv,
                           "position": np.asarray(cp, np.float64)}
                          for cv, cp in cands]}


def test_incremental_discovery_and_visited():
    g = GraphMap("A")
    g.update_graph(_ob("A", (0, 0, 0), [("B", (1, 0, 0)), ("D", (0, 1, 0))]))
    assert g.visited("A") and not g.visited("B")
    # C not discovered yet
    assert set(g.nodes()) == {"A", "B", "D"}
    assert abs(g.graph.distance("A", "B") - 1.0) < 1e-9

    # move to B: C appears; A->C relaxes through B (FloydGraph update)
    g.update_graph(_ob("B", (1, 0, 0), [("A", (0, 0, 0)), ("C", (1, 1, 0))]))
    assert g.visited("B")
    assert abs(g.graph.distance("A", "C") - 2.0) < 1e-9
    assert g.graph.path("A", "C") == ["B", "C"]   # excludes the source

    # D-C edge shortens nothing for A->C (2 via B == 2 via D), but
    # C->D becomes direct once discovered at C
    g.update_graph(_ob("C", (1, 1, 0), [("B", (1, 0, 0)), ("D", (0, 1, 0))]))
    assert abs(g.graph.distance("C", "D") - 1.0) < 1e-9


def test_node_embed_mean_pooling_and_rewrite():
    g = GraphMap("A")
    g.update_node_embed("B", np.full(4, 2.0))
    g.update_node_embed("B", np.full(4, 4.0))
    np.testing.assert_allclose(g.get_node_embed("B"), np.full(4, 3.0))
    # rewrite=True resets the accumulator (the current node's pooled
    # pano embed replaces stale partial views, graph_utils.py:119-133)
    g.update_node_embed("B", np.full(4, 10.0), rewrite=True)
    np.testing.assert_allclose(g.get_node_embed("B"), np.full(4, 10.0))
    assert g.has_node_embed("B") and not g.has_node_embed("C")


def test_get_pos_fts_layout_and_padding():
    g = GraphMap("A")
    g.update_graph(_ob("A", (0, 0, 0), [("B", (3, 0, 0))]))
    fts = g.get_pos_fts("A", [None, "B", None], cur_heading=0.0,
                        cur_elevation=0.0, angle_feat_size=4)
    assert fts.shape == (3, 7)
    # None rows carry the zero-angle feature and zero dist/step tails
    np.testing.assert_allclose(fts[0, 4:], 0.0)
    np.testing.assert_allclose(fts[2, 4:], 0.0)
    # real row: line dist == graph dist == 3, steps == 1 (normalized)
    assert abs(fts[1, 4] - 3.0 / MAX_DIST) < 1e-6
    assert abs(fts[1, 5] - 3.0 / MAX_DIST) < 1e-6
    assert abs(fts[1, 6] - 1.0 / MAX_STEP) < 1e-6


def test_save_to_json_dump():
    g = GraphMap("A")
    g.update_graph(_ob("A", (0, 0, 0), [("B", (1, 0, 0))]))
    g.node_stop_scores["A"] = {"stop": 0.25}
    dump = g.save_to_json()
    assert dump["nodes"]["A"]["visited"] is True
    assert dump["nodes"]["A"]["stop_prob"] == 0.25
    assert dump["nodes"]["B"]["visited"] is False
    assert ("A", "B") in [tuple(e) for e in dump["edges"]]
