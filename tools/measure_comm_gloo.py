#!/usr/bin/env python
"""Measured cross-process collective times at config-4 RCS shapes.

Spawns 2 processes x 1 virtual CPU device over the gloo (DCN-path)
backend and measures `psum` and `psum_scatter` of the dense (K*D)^2
reduced camera system — the per-LM-iteration communication of
parallel/dist_ba.py. Writes COMM_GLOO.json, which
tools/measure_scaling.py merges into SCALING_r*.json as the MEASURED
communication datapoint cross-checking its analytic ICI model (round-3
VERDICT item 9: "nothing validates the communication constant").

gloo over localhost is the PESSIMISTIC fabric: it measured ~0.43 GB/s
for the 9.4 MB payload on this host; TPU ICI is ~2 orders faster, which
is what the model's 45 GB/s effective constant assumes.

Usage: python tools/measure_comm_gloo.py            (spawns the pair)
       python tools/measure_comm_gloo.py --child N  (internal)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "COMM_GLOO.json")
KD = 256 * 6  # config-4: K=256 cameras x 6 dof


def child(proc_id: int):
    from viorb_tpu.parallel import multihost

    multihost.init_multihost(
        coordinator="localhost:9913", num_processes=2, process_id=proc_id,
        cpu_devices_per_process=1,
    )
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = multihost.global_mesh()
    x = jax.device_put(
        np.ones((2, KD, KD), np.float32),
        NamedSharding(mesh, P("lm")),
    )

    import jax.numpy as jnp

    psum_prog = jax.jit(
        shard_map(lambda a: jax.lax.psum(a, "lm"), mesh=mesh,
                  in_specs=P("lm"), out_specs=P("lm"))
    )

    def _rs(a):
        return jax.lax.psum_scatter(
            a[0].reshape(2, KD // 2, KD), "lm", scatter_dimension=0
        )

    rs_prog = jax.jit(
        shard_map(_rs, mesh=mesh, in_specs=P("lm"), out_specs=P("lm", None))
    )

    res = {}
    for name, prog in (("psum", psum_prog), ("reduce_scatter", rs_prog)):
        r = prog(x)
        jax.block_until_ready(r)
        best = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                r = prog(x)
            jax.block_until_ready(r)
            best.append((time.perf_counter() - t0) / 3)
        res[name + "_s"] = min(best)

    payload = KD * KD * 4
    res.update(
        payload_bytes=payload,
        implied_bw_psum_Bps=payload / res["psum_s"],
        fabric="gloo DCN-path, 2 processes, localhost",
        shape=f"({KD}, {KD}) float32 (config-4 reduced camera system)",
    )
    if proc_id == 0:
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res))


def main():
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p1 = subprocess.Popen(
        [sys.executable, __file__, "--child", "1"], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        subprocess.run(
            [sys.executable, __file__, "--child", "0"], env=env,
            check=True, timeout=300,
        )
    finally:
        p1.wait(timeout=60)


if __name__ == "__main__":
    main()
