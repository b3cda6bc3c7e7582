"""Exercise the REAL multi-host branch of all_gather_objects.

Every in-process test sees jax.process_count() == 1 and short-circuits
(parallel/dist.py:19-20), so the process_allgather path that replaces
the reference's pickle-padded torch all_gather
(tools/common_utils.py:105-166) would otherwise never run. This test
launches two jax.distributed CPU processes that round-trip unequal-size
payloads through it.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address={coord!r},
                               num_processes=2, process_id=pid)
    from navillm_tpu.parallel.dist import all_gather_objects, \\
        merge_dist_results

    # unequal payload sizes across ranks (the padding path)
    local = [{{"instr_id": f"r{{pid}}_{{k}}", "rank": pid,
              "blob": "x" * (50 + 400 * pid)}} for k in range(pid + 1)]
    gathered = all_gather_objects(local)
    merged = merge_dist_results(gathered)
    print("RESULT" + json.dumps({{
        "n_parts": len(gathered),
        "ids": sorted(m["instr_id"] for m in merged),
        "sizes": [len(g) for g in gathered],
    }}))
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_object_allgather(tmp_path):
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO), coord=coord))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""   # no virtual-device forcing in the children
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
        assert p.returncode == 0, out
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        res = json.loads(line[len("RESULT"):])
        assert res["n_parts"] == 2
        assert res["sizes"] == [1, 2]
        assert res["ids"] == ["r0_0", "r1_0", "r1_1"]
