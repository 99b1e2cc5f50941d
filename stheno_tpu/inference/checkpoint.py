"""Sampler-state checkpoint / resume (SURVEY.md §5: pod-scale NUTS/SMC runs
are long-running → checkpoint (rng key, chain states, adaptation state) per
host; the reference has nothing to checkpoint).

Format: a directory of ``.npy`` files mirroring the pytree structure plus a
JSON structure digest — no external checkpoint dependency, works for any
pytree of arrays (orbax can be slotted in later without changing call
sites).

Structure compatibility is checked with a **version-stable digest**: the
flattened key-path list plus per-leaf shapes/dtypes, compared field-wise —
NOT the repr of the treedef, which is not stable across JAX versions (a
repr change would falsely reject every old checkpoint).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _path_str(path) -> str:
    """Normalised key-path string, independent of jax.tree_util.keystr's
    formatting (which may change between JAX versions)."""
    parts = []
    for entry in path:
        if hasattr(entry, "idx"):  # SequenceKey
            parts.append(f"[{entry.idx}]")
        elif hasattr(entry, "name"):  # GetAttrKey
            parts.append(f".{entry.name}")
        elif hasattr(entry, "key"):  # DictKey / FlattenedIndexKey
            parts.append(f"[{entry.key!r}]")
        else:  # pragma: no cover - future key types
            parts.append(f".{entry}")
    return "".join(parts)


def _structure_record(tree):
    """[{path, shape, dtype}, ...] in flatten order — the stored digest."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [
        {
            "path": _path_str(p),
            "shape": list(np.shape(leaf)),
            "dtype": str(np.asarray(leaf).dtype),
        }
        for p, leaf in leaves
    ]


def _check_structure(stored, expected):
    if len(stored) != len(expected):
        raise ValueError(
            f"checkpoint has {len(stored)} leaves, expected {len(expected)}"
        )
    for s, e in zip(stored, expected):
        if s["path"] != e["path"]:
            raise ValueError(
                "checkpoint structure does not match the `like` pytree: "
                f"stored leaf at {s['path']!r}, expected {e['path']!r}"
            )
        if list(s["shape"]) != list(e["shape"]):
            raise ValueError(
                f"checkpoint leaf {s['path']!r} has shape {s['shape']}, "
                f"expected {e['shape']}"
            )
        if s["dtype"] != e["dtype"]:
            raise ValueError(
                f"checkpoint leaf {s['path']!r} has dtype {s['dtype']}, "
                f"expected {e['dtype']}"
            )


def save_checkpoint(path: str, tree, step: int | None = None):
    """Write a pytree of arrays to `path` (a directory)."""
    os.makedirs(path, exist_ok=True)
    flat = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(flat):
        np.save(os.path.join(path, f"leaf_{i}.npy"), np.asarray(leaf))
    meta = {"num_leaves": len(flat), "structure": _structure_record(tree)}
    if step is not None:
        meta["step"] = int(step)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def load_checkpoint(path: str, like):
    """Read a checkpoint written by `save_checkpoint`; `like` is a pytree
    with the same structure (its values provide the treedef).

    Rejects leaf-count and *structure* mismatches (wrong-but-same-arity
    structures would silently scramble leaves) by comparing the stored
    key-path/shape/dtype digest field-wise.  Legacy checkpoints (pre-digest
    format) are checked against `like`'s leaf count and the shapes of the
    stored arrays themselves; their stored treedef-repr string is ignored
    (it is not comparable across JAX versions)."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    _, treedef = jax.tree_util.tree_flatten(like)
    flat = [
        np.load(os.path.join(path, f"leaf_{i}.npy"))
        for i in range(meta["num_leaves"])
    ]
    expected = _structure_record(like)
    if "structure" in meta:
        _check_structure(meta["structure"], expected)
    else:
        # legacy format: digest the loaded arrays (paths unknown → use
        # expected paths so only shape/dtype can mismatch)
        stored = [
            {
                "path": e["path"],
                "shape": list(np.shape(a)),
                "dtype": str(a.dtype),
            }
            for e, a in zip(expected, flat)
        ]
        if len(flat) != len(expected):
            raise ValueError(
                f"checkpoint has {len(flat)} leaves, expected {len(expected)}"
            )
        _check_structure(stored, expected)
    return jax.tree_util.tree_unflatten(treedef, flat)


def checkpoint_step(path: str) -> int | None:
    try:
        with open(os.path.join(path, "meta.json")) as fh:
            return json.load(fh).get("step")
    except FileNotFoundError:
        return None
