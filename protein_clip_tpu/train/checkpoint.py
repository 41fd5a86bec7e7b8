"""Checkpointing: Orbax for full train state + flat-npz export for parity.

The reference saves ``torch.save(state_dict)`` on each val improvement
(main.py:78-81) and reloads it for test eval / offline tools. Here:
- Orbax StandardCheckpointer persists {params, opt_state, epoch, ...};
- ``export_npz``/``load_npz`` give a torch-free flat-array interchange format
  (path-joined keys) for parity checks against reference checkpoints.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def export_npz(path: str | Path, tree: Any) -> None:
    np.savez(path, **_flatten(tree))


def load_npz(path: str | Path, like: Any) -> Any:
    """Load a flat npz back into the structure of ``like``."""
    data = np.load(path)
    flat = _flatten(like)
    missing = set(flat) - set(data.files)
    if missing:
        raise KeyError(f"checkpoint missing keys: {sorted(missing)[:5]} ...")
    leaves_with_path = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path_keys, leaf in leaves_with_path[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_keys)
        arr = data[key]
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(leaves_with_path[1], new_leaves)


def save_orbax(path: str | Path, tree: Any) -> None:
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str | Path, like: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), like)
