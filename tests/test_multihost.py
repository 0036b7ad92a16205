"""Multi-host smoke test: 2 CPU processes x 2 virtual devices run the
distributed Schur BA over a process-spanning mesh (jax.distributed + gloo
collectives) and must agree with a single-process run of the identical
problem (parallel/multihost.py + tools/run_multihost.py).

The reference has no multi-process mode (SURVEY.md section 2.4); this
covers BASELINE's "2+ hosts" scale-out requirement without TPU-pod
hardware. Subprocess-spawned because jax.distributed can only be
initialized once per process.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(ROOT, "tools", "run_multihost.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # the driver sets its own platform/device-count config
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    return env


def _run(args_list, timeout=600):
    procs = []
    for args in args_list:
        procs.append(
            subprocess.Popen(
                [sys.executable, DRIVER] + args,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=_clean_env(), cwd=ROOT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    return outs


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    out2 = str(tmp_path / "two.json")
    out1 = str(tmp_path / "one.json")

    port = _free_port()
    coord = f"localhost:{port}"
    _run([
        ["--coordinator", coord, "--num-processes", "2", "--process-id", "0",
         "--cpu-devices", "2", "--out", out2],
        ["--coordinator", coord, "--num-processes", "2", "--process-id", "1",
         "--cpu-devices", "2"],
    ])

    port = _free_port()
    _run([
        ["--coordinator", f"localhost:{port}", "--num-processes", "1",
         "--process-id", "0", "--cpu-devices", "4", "--out", out1],
    ])

    with open(out2) as f:
        r2 = json.load(f)
    with open(out1) as f:
        r1 = json.load(f)

    assert r2["processes"] == 2 and r2["devices"] == 4
    assert r1["processes"] == 1 and r1["devices"] == 4
    # same 4-device mesh partitioning -> identical reductions -> identical
    # results up to float reassociation in gloo vs local all-reduce
    assert r2["cost_final"] < 1e-3 * r2["cost_initial"]
    assert abs(r2["cost_final"] - r1["cost_final"]) <= 1e-3 * max(
        r1["cost_final"], 1.0
    )
    assert abs(r2["tcw_checksum"] - r1["tcw_checksum"]) <= 1e-3 * max(
        abs(r1["tcw_checksum"]), 1.0
    )
