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


def import_reference_state_dict(sd: dict[str, Any]) -> dict[str, Any]:
    """Convert a reference ``ExtendedCLIP``/``ExtendedFILIP`` state_dict into
    the framework's trainable head pytree.

    The reference checkpoints a full ``torch.save(model.state_dict())``
    (``/root/reference/main.py:78-81``) whose parameter names come from
    ``modules/models.py:25-30,109-113``: per-side
    ``{pep,rec}_encoder.projection.*``, Sequential-indexed
    ``amino_acid_ffn.{i}.{0,2}.*`` blocks with a final un-nested Linear
    (``models.py:66-73``), and a top-level scalar ``temperature``.
    ``*.esm_model.*`` entries (the shared frozen backbone, saved under BOTH
    encoder prefixes) are skipped here — convert those separately with
    ``esm2.convert_hf_state_dict`` after stripping one encoder prefix.

    Accepts numpy arrays (call ``.numpy()`` on torch tensors first). Linear
    weights are transposed from torch's (out, in) to our (in, out). The same
    mapping covers FILIP: ``FILIPEncoder`` declares the identical parameter
    set (``models.py:150-156``), including the unused-at-forward
    ``embedding_ffn``.
    """
    import jax.numpy as jnp

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if ".esm_model." not in k}

    def ffn(prefix: str) -> dict[str, Any]:
        idxs = sorted({int(k[len(prefix) + 1:].split(".")[0])
                       for k in sd if k.startswith(prefix + ".")})
        out_i = idxs[-1]
        dim = sd[f"{prefix}.{out_i}.weight"].shape[0]

        def stack(keys, empty_shape):
            arrs = [sd[k] for k in keys]
            return jnp.asarray(np.stack(arrs) if arrs
                               else np.zeros(empty_shape, np.float32))

        hidden = idxs[:-1]
        return {
            "blocks": {
                "w": stack([f"{prefix}.{i}.0.weight" for i in hidden],
                           (0, dim, dim)).transpose(0, 2, 1),
                "b": stack([f"{prefix}.{i}.0.bias" for i in hidden], (0, dim)),
                "ln_w": stack([f"{prefix}.{i}.2.weight" for i in hidden],
                              (0, dim)),
                "ln_b": stack([f"{prefix}.{i}.2.bias" for i in hidden],
                              (0, dim)),
            },
            "out": {"w": jnp.asarray(sd[f"{prefix}.{out_i}.weight"].T),
                    "b": jnp.asarray(sd[f"{prefix}.{out_i}.bias"])},
        }

    def side(name: str) -> dict[str, Any]:
        return {
            "projection": {
                "w": jnp.asarray(sd[f"{name}.projection.weight"].T),
                "b": jnp.asarray(sd[f"{name}.projection.bias"]),
            },
            "aa_ffn": ffn(f"{name}.amino_acid_ffn"),
            "emb_ffn": ffn(f"{name}.embedding_ffn"),
        }

    return {"pep": side("pep_encoder"), "rec": side("rec_encoder"),
            "temperature": jnp.asarray(sd["temperature"], jnp.float32)}


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
