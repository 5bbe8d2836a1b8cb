"""Real multi-process execution tests (VERDICT r1 item 3, hardened r3).

Launches 2 OS processes that join one ``jax.distributed`` CPU cluster
(4 forced host devices each → 8 global devices), build a mesh, and run one
sharded train step — exercising ``put_global`` placement (each process
places only its addressable shards; a plain device_put would raise on
non-addressable devices), cross-process Gloo collectives, and the sharded
Pallas pack path (jnp reference twins on CPU). Losses must agree across
processes and with a single-process reference.

Covered topologies (VERDICT r2 item 8): the mixed 4x2 mesh, a data-only
8x1 split, and a model-only 1x8 split. The mixed case also runs a
multi-process Orbax save/restore roundtrip of the sharded train state.
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
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
data_axis = int(sys.argv[2])
model_axis = int(sys.argv[3])
ckpt_dir = sys.argv[4]
jax.distributed.initialize(coordinator_address="localhost:%d",
                           num_processes=2, process_id=pid)
sys.path.insert(0, {repo!r})
from __graft_entry__ import _build_tiny
from ihgnn_tpu.config import MeshConfig
from ihgnn_tpu.parallel.mesh import make_mesh
from ihgnn_tpu.parallel.sharding import shard_batch, shard_graph, shard_state

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
mesh = make_mesh(MeshConfig(data=data_axis, model=model_axis))
cfg, data, graph, model, state, batch, make_step = _build_tiny(
    table_row_multiple=model_axis, pad_edges_to=data_axis, mesh=mesh)
assert graph.skp is not None  # sharded Pallas pack path active
state = shard_state(state, mesh)
graph = shard_graph(graph, mesh)
batch = shard_batch(batch, mesh)
new_state, loss = make_step(graph)(state, batch)
print("MULTIHOST_LOSS", repr(float(loss)), flush=True)

if ckpt_dir != "-":
    # multi-process Orbax roundtrip of the SHARDED train state: every
    # process participates in save and restore; restored shards must match
    # the local shards bit-for-bit
    from ihgnn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    name = save_checkpoint(ckpt_dir, 3, new_state)
    epoch, restored = restore_checkpoint(ckpt_dir, "latest", new_state)
    assert epoch == 3, epoch
    for a, b in zip(jax.tree.leaves(new_state), jax.tree.leaves(restored)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))
    print("MULTIHOST_CKPT_OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(data_axis: int, model_axis: int, ckpt_dir: str = "-"):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    script = (_CHILD % port).format(repo=REPO)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(i), str(data_axis),
         str(model_axis), ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)   # loaded boxes: 300 was marginal
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_LOSS")]
        assert lines, out
        losses.append(float(lines[0].split()[1].strip("'\"")))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    return losses, outs


def _single_process_loss(data_axis: int, model_axis: int) -> float:
    from __graft_entry__ import _build_tiny
    from ihgnn_tpu.config import MeshConfig
    from ihgnn_tpu.parallel.mesh import make_mesh
    from ihgnn_tpu.parallel.sharding import (shard_batch, shard_graph,
                                             shard_state)

    mesh = make_mesh(MeshConfig(data=data_axis, model=model_axis))
    cfg, data, graph, model, state, batch, make_step = _build_tiny(
        table_row_multiple=model_axis, pad_edges_to=data_axis, mesh=mesh)
    state = shard_state(state, mesh)
    graph = shard_graph(graph, mesh)
    batch = shard_batch(batch, mesh)
    _, loss_ref = make_step(graph)(state, batch)
    return float(loss_ref)


def test_two_process_step_matches_single_process(tmp_path):
    """Mixed 4x2 mesh + multi-process Orbax save/restore roundtrip."""
    losses, outs = _run_pair(4, 2, ckpt_dir=str(tmp_path))
    for out in outs:
        assert "MULTIHOST_CKPT_OK" in out, out
    assert losses[0] == pytest.approx(_single_process_loss(4, 2), rel=1e-4)


def test_two_process_data_only_split():
    """8x1 mesh: the process boundary cuts only the data axis."""
    losses, _ = _run_pair(8, 1)
    assert losses[0] == pytest.approx(_single_process_loss(8, 1), rel=1e-4)


def test_two_process_model_only_split():
    """1x8 mesh: the process boundary cuts only the model (table) axis."""
    losses, _ = _run_pair(1, 8)
    assert losses[0] == pytest.approx(_single_process_loss(1, 8), rel=1e-4)
