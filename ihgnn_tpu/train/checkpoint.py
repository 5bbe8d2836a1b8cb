"""Checkpoint save/restore of the full train state (params + Adam moments +
step + lr) via Orbax — the TPU-native equivalent of the reference's
``torch.save({'epoch_count', 'model', 'optimizer'})`` protocol
(Main.py:195-214, 252-262), including the ``latest`` resolution rule
(lexicographically-last ``checkpoint_*`` entry)."""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp


def checkpoint_name(epoch: int) -> str:
    stamp = time.strftime("%y%m%d-%H%M%S", time.localtime())
    return f"checkpoint_{stamp}_epoch{epoch}"


def save_checkpoint(result_dir: str, epoch: int, state) -> str:
    """Write state under result_dir/<checkpoint_name>; returns the name."""
    name = checkpoint_name(epoch)
    path = os.path.abspath(os.path.join(result_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"epoch_count": epoch, "state": state})
        ckptr.wait_until_finished()
    return name


def find_latest(result_dir: str) -> Optional[str]:
    if not os.path.isdir(result_dir):
        return None
    names = sorted(n for n in os.listdir(result_dir) if n.startswith("checkpoint_"))
    return names[-1] if names else None


def restore_checkpoint(result_dir: str, name: str, state_like) -> Tuple[int, object]:
    """Restore (epoch_count, state). ``name`` may be 'latest'.
    ``state_like`` is an abstract/concrete pytree with the target structure."""
    if name == "latest":
        resolved = find_latest(result_dir)
        if resolved is None:
            raise FileNotFoundError(f"no checkpoint_* in {result_dir}")
        name = resolved
    path = os.path.abspath(os.path.join(result_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, {"epoch_count": 0, "state": state_like})
    return int(restored["epoch_count"]), restored["state"]
