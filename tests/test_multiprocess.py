"""True multi-process distributed execution (SURVEY.md §4's "multi-process
local test mode").

The reference's launch path crosses real process boundaries every run
(reference engine/launch.py:24-94: mp.spawn workers + dist.init_process_group;
utils/comm.py:83-219: pickled-object gather over a gloo side group).  The TPU
analog is one JAX process per host joining a global mesh via
``jax.distributed.initialize``.  This test spawns TWO real processes (CPU
platform, 4 virtual devices each → an 8-device global mesh), runs
``engine.defaults.launch`` → a sharded train step + ``comm.all_gather``
evaluator-style result merging in each, and checks the losses equal a
1-process 8-device run of the same program.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    kept = [
        tok
        for tok in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in tok
    ]
    kept.append(f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["XLA_FLAGS"] = " ".join(kept)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the axon TPU plugin out
    return env


def _launch_world(world: int, devices_per_proc: int, tmp_path, timeout=300):
    port = _free_port()
    procs, outs = [], []
    for rank in range(world):
        out = str(tmp_path / f"w{world}_r{rank}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, str(world), str(rank), str(port), out],
                env=_env(devices_per_proc),
                cwd=_REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, f"worker failed:\n{logs[-1][-4000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_launch_matches_single_process(tmp_path):
    two = _launch_world(2, 4, tmp_path)
    one = _launch_world(1, 8, tmp_path)[0]

    r0, r1 = sorted(two, key=lambda r: r["rank"])
    assert r0["world"] == r1["world"] == 2
    assert r0["n_global_devices"] == r1["n_global_devices"] == 8
    assert one["world"] == 1 and one["n_global_devices"] == 8

    # every process observes the same (psum-reduced, replicated) loss
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert all(np.isfinite(r0["losses"]))
    # and the 2-process run computes the same training trajectory as the
    # 1-process 8-device run (same global batch, same init seeds; the
    # cross-process gloo psum reduces in a different order than the
    # single-process XLA reduction → agreement to float32 roundoff only)
    np.testing.assert_allclose(r0["losses"], one["losses"], rtol=1e-3)

    # evaluator-style merge: both ranks hold the full prediction set
    assert r0["merged_ids"] == r1["merged_ids"] == [0, 1, 2, 10, 11, 12]
    # single-process short-circuit sees only its own predictions
    assert one["merged_ids"] == [0, 1, 2]

    # gather(dst=0): only rank 0 receives
    assert r0["gather_len"] == 2 and r1["gather_len"] == 0

    # reduce_dict means across ranks {1,2} and {2,4}
    assert r0["reduced"] == {"a": 1.5, "b": 3.0}
    assert r1["reduced"] == {"a": 1.5, "b": 3.0}

    # shared_random_seed agrees across ranks
    assert r0["shared_seed"] == r1["shared_seed"]
