import os
import sys

# Force an 8-device CPU mesh for all tests: multi-chip sharding is validated
# on virtual devices (the real machine has one TPU chip; see SURVEY.md §2.2).
#
# The image's sitecustomize registers a TPU PJRT plugin at *interpreter
# startup* and exports JAX_PLATFORMS=axon, so env vars set here are too
# late — but the backend itself is not yet *initialized*, so overriding
# the platform through jax.config still wins.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json
import math
from pathlib import Path

import numpy as np
import pytest


def make_grid_connectivity(tmpdir: Path, scan: str = "scan0", rows: int = 4,
                           cols: int = 4, spacing: float = 2.0,
                           drop_edges=()) -> Path:
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
    tmpdir.mkdir(parents=True, exist_ok=True)
    out = tmpdir / f"{scan}_connectivity.json"
    with open(out, "w") as f:
        json.dump(data, f)
    return out


@pytest.fixture(scope="session")
def world_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("connectivity")
    make_grid_connectivity(d, scan="scan0", rows=4, cols=4)
    make_grid_connectivity(d, scan="scan1", rows=3, cols=5,
                           drop_edges=[((0, 1), (0, 2)), ((1, 2), (2, 2))])
    return d


@pytest.fixture(scope="session")
def world(world_dir):
    from navillm_tpu.sim import WorldModel
    return WorldModel(world_dir, scans=["scan0", "scan1"])
