"""Real multi-process jax.distributed bring-up (SURVEY §2.3 comm backend).

The reference is single-process (generate_construction_data.py has no
distribution story at all); the TPU framework scales over hosts via
jax.distributed + a global mesh. This test actually RUNS a 2-process CPU
cluster — subprocess workers, localhost coordinator — and checks that
parallel.mesh.initialize_distributed builds a global mesh whose collective
(a jitted cross-process sum) produces the right value on both ranks.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import numpy as np
    import jax
    # initialize_distributed must run before ANYTHING touches the backend
    # (jax.devices / device_put / config probes in library imports).
    from constructionsceneposeestimation_tpu.parallel import mesh as mesh_mod
    coord, n, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mesh_mod.initialize_distributed(coord, n, rank)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    assert jax.process_count() == n, jax.process_count()
    assert len(jax.devices()) == n, jax.devices()  # one CPU device per proc
    mesh = mesh_mod.make_mesh()
    assert mesh.shape[mesh_mod.DATA_AXIS] == n

    # Each rank contributes (rank+1) on its shard; the jitted global sum
    # requires a real cross-process collective.
    local = np.full((1, 4), rank + 1.0, np.float32)
    arr = jax.make_array_from_process_local_data(
        mesh_mod.batch_sharding(mesh), local, (n, 4))
    total = jax.jit(jnp.sum,
                    out_shardings=mesh_mod.replicated(mesh))(arr)
    expect = 4.0 * sum(range(1, n + 1))
    assert float(total) == expect, (float(total), expect)

    # FSDP sharding specs build against the global mesh too.
    params = {"w": jnp.zeros((n * 2, 3)), "b": jnp.zeros((3,))}
    specs = mesh_mod.shard_params_fsdp(mesh, params)
    assert specs["w"].spec == P(mesh_mod.DATA_AXIS, None), specs["w"].spec
    print(f"OK rank={rank}")
""")


@pytest.mark.slow
def test_two_process_cpu_cluster():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {**os.environ, "JAX_PLATFORM_NAME": "cpu",
           "XLA_FLAGS": ""}  # workers use 1 real CPU device each
    env.pop("JAX_PLATFORMS", None)
    # Keep the axon sitecustomize from registering the tunneled TPU plugin:
    # backend discovery initializes every registered plugin, so a wedged
    # tunnel would hang the workers even with JAX_PLATFORM_NAME=cpu.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, coord, "2", str(r)],
                         cwd=REPO, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"OK rank={r}" in out, out
