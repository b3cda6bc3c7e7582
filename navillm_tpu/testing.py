"""Synthetic fixtures: random nav batches + tiny worlds for tests/bench.

The reference never shipped tests; its only fixture idea was a tiny
2-layer Llama (vln_bert.py:30-75, unused). Here synthetic batches are
first-class so every layer can be driven hermetically (SURVEY.md §4).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .models.nav_model import NavModelConfig


def synthetic_nav_batch(cfg: NavModelConfig, b: int = 2, g: int = 12,
                        v: int = 8, c: int = 8, hh: int = 4, tlen: int = 64,
                        seed: int = 0, vocab_low: int = 3,
                        vocab_high: int = None) -> Dict[str, np.ndarray]:
    """Random but structurally-consistent navigation batch (fixed shapes).

    Graph layout: slots 0..n_nodes-1 valid, slot 1 visited; local cands
    1..3 map to slots 2..4; cand tokens cover unvisited non-stop slots.
    """
    r = np.random.RandomState(seed)
    h = cfg.hidden_size
    vocab_high = vocab_high or (cfg.llm.vocab_size - 1)
    n_nodes = min(6, g)
    gmask = np.zeros((b, g), bool)
    gmask[:, :n_nodes] = True
    visited = np.zeros((b, g), bool)
    visited[:, 1] = True
    match = np.full((b, v), -1, np.int32)
    for j, s in ((1, 2), (2, 3), (3, 4)):
        if j < v and s < n_nodes:
            match[:, j] = s
    pano_m = np.zeros((b, v), bool)
    pano_m[:, : min(5, v)] = True
    cand_slots = [s for s in range(2, n_nodes) if not visited[0, s]] + [5]
    cand_slots = [s for s in cand_slots if s < n_nodes][: c]
    order = np.full((b, c), -1, np.int32)
    cand_pos = np.full((b, c), -1, np.int32)
    for bi in range(b):
        perm = r.permutation(cand_slots)
        order[bi, : len(perm)] = perm
        cand_pos[bi, : len(perm)] = 8 + 2 * np.arange(len(perm))
    hist_pos = np.full((b, hh), -1, np.int32)
    hist_pos[:, 0] = 4
    return {
        "gmap_img_embeds": r.randn(b, g, h).astype(np.float32),
        "gmap_step_ids": r.randint(0, 5, (b, g)).astype(np.int32),
        "gmap_pos_fts": r.randn(b, g, cfg.angle_feat_size + 3).astype(np.float32),
        "gmap_masks": gmask,
        "gmap_visited_masks": visited,
        "vp_img_embeds": r.randn(b, v, h).astype(np.float32),
        "vp_pos_fts": r.randn(b, v, 2 * cfg.angle_feat_size + 6).astype(np.float32),
        "pano_masks": pano_m,
        "local_match_slot": match,
        "cand_order": order,
        "cand_positions": cand_pos,
        "hist_positions": hist_pos,
        "hist_embeds": r.randn(b, hh, h).astype(np.float32),
        "input_ids": r.randint(vocab_low, vocab_high, (b, tlen)).astype(np.int32),
        "attention_mask": np.ones((b, tlen), bool),
        "cls_pos": np.full((b,), tlen - 1, np.int32),
    }


import json as _json
from pathlib import Path as _Path


def make_grid_connectivity(tmpdir, scan: str = "scan0", rows: int = 4,
                           cols: int = 4, spacing: float = 2.0,
                           drop_edges=()) -> "_Path":
    """Write a Matterport-style connectivity JSON for a grid world.

    Node (r, c) sits at (c*spacing, r*spacing, 0) with id 'vp_r_c'.
    4-connected grid; `drop_edges` removes specific ((r,c),(r,c)) links.
    """
    n = rows * cols
    ids = [f"vp_{r}_{c}" for r in range(rows) for c in range(cols)]
    pos = [(c * spacing, r * spacing, 0.0) for r in range(rows) for c in range(cols)]
    unob = [[False] * n for _ in range(n)]
    dropped = {frozenset(e) for e in drop_edges}

    def k(r, c):
        return r * cols + c

    for r in range(rows):
        for c in range(cols):
            for dr, dc in ((0, 1), (1, 0)):
                r2, c2 = r + dr, c + dc
                if r2 < rows and c2 < cols and frozenset(((r, c), (r2, c2))) not in dropped:
                    unob[k(r, c)][k(r2, c2)] = True
                    unob[k(r2, c2)][k(r, c)] = True

    data = []
    for i in range(n):
        x, y, z = pos[i]
        pose = [0.0] * 16
        pose[3], pose[7], pose[11] = x, y, z
        data.append({
            "image_id": ids[i],
            "pose": pose,
            "included": True,
            "unobstructed": unob[i],
            "height": 1.5,
        })
    tmpdir = _Path(tmpdir)
    tmpdir.mkdir(parents=True, exist_ok=True)
    out = tmpdir / f"{scan}_connectivity.json"
    with open(out, "w") as f:
        _json.dump(data, f)
    return out
