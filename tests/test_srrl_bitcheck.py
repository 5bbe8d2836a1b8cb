"""Controlled Srrl cross-implementation check: identical weights and
batches through our jax Srrl and the torch replay must produce the same
per-step KG/PS losses (tools/srrl_bitcheck.py). This pins the semantic
parity that the statistical PARITY table can't (different RNG streams)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_srrl_bitcheck(tmp_path):
    ds = str(tmp_path / "ds")
    gen = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from ihgnn_tpu.data.artifacts import write_synthetic_dataset;"
        f"write_synthetic_dataset({ds!r}, seed=11, user_count=25,"
        "query_count=15, item_count=40, vocab_size=30, log_count=300)")
    subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "srrl_bitcheck.py"),
         "--dataset", ds, "--steps", "6"],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "SRRL BITCHECK OK" in out.stdout
