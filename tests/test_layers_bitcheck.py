"""Layer-zoo cross-implementation checks: identical weights and batches
through our jax RawGnn and the torch replay of the reference layer math
must produce the same per-step losses (tools/layers_bitcheck.py). Pins
GCN / GAT / HGCN / IHGNN+phase-2 semantics directly against torch — the
statistical PARITY tables can't catch a wrong quirk inside seed spread."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("gnn", ["gcn", "gat", "hgcn", "phase2"])
def test_layer_bitcheck(gnn):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "layers_bitcheck.py"),
         "--gnn", gnn, "--steps", "6"],
        capture_output=True, text=True, cwd=REPO, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert f"LAYER BITCHECK OK [{gnn}]" in out.stdout
