"""Real multi-process execution test (VERDICT round-1 item 3).

Launches 2 OS processes that join one ``jax.distributed`` CPU cluster
(4 forced host devices each → 8 global devices), build the same 4x2 mesh
the single-process tests use, and run one sharded train step — exercising
``put_global`` placement (each process places only its addressable
shards; a plain device_put would raise on non-addressable devices),
cross-process Gloo collectives, and the sharded Pallas pack path (jnp
reference twins on CPU). Losses must agree across processes and with a
single-process reference.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%d",
                           num_processes=2, process_id=pid)
sys.path.insert(0, {repo!r})
from __graft_entry__ import _build_tiny
from ihgnn_tpu.config import MeshConfig
from ihgnn_tpu.parallel.mesh import make_mesh
from ihgnn_tpu.parallel.sharding import shard_batch, shard_graph, shard_state

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
mesh = make_mesh(MeshConfig(data=4, model=2))
cfg, data, graph, model, state, batch, make_step = _build_tiny(
    table_row_multiple=2, pad_edges_to=4, mesh=mesh)
assert graph.skp is not None  # sharded Pallas pack path active
state = shard_state(state, mesh)
graph = shard_graph(graph, mesh)
batch = shard_batch(batch, mesh)
new_state, loss = make_step(graph)(state, batch)
print("MULTIHOST_LOSS", repr(float(loss)), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    script = (_CHILD % port).format(repo=REPO)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True,
                              cwd=REPO)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_LOSS")]
        assert lines, out
        losses.append(float(lines[0].split()[1].strip("'\"")))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # single-process reference on the in-test virtual 8-device mesh
    from __graft_entry__ import _build_tiny
    from ihgnn_tpu.config import MeshConfig
    from ihgnn_tpu.parallel.mesh import make_mesh
    from ihgnn_tpu.parallel.sharding import (shard_batch, shard_graph,
                                             shard_state)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    cfg, data, graph, model, state, batch, make_step = _build_tiny(
        table_row_multiple=2, pad_edges_to=4, mesh=mesh)
    state = shard_state(state, mesh)
    graph = shard_graph(graph, mesh)
    batch = shard_batch(batch, mesh)
    _, loss_ref = make_step(graph)(state, batch)
    assert losses[0] == pytest.approx(float(loss_ref), rel=1e-4)
