"""Sampler-state checkpoint / resume (SURVEY.md §5: pod-scale NUTS/SMC runs
are long-running → checkpoint (rng key, chain states, adaptation state) per
host; the reference has nothing to checkpoint).

Format: a directory of ``.npy`` files mirroring the pytree structure plus a
JSON treedef — no external checkpoint dependency, works for any pytree of
arrays (orbax can be slotted in later without changing call sites).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, tree, step: int | None = None):
    """Write a pytree of arrays to `path` (a directory)."""
    os.makedirs(path, exist_ok=True)
    flat, treedef = _flatten_with_paths(tree)
    for i, leaf in enumerate(flat):
        np.save(os.path.join(path, f"leaf_{i}.npy"), np.asarray(leaf))
    meta = {"num_leaves": len(flat), "treedef": str(treedef)}
    if step is not None:
        meta["step"] = int(step)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def load_checkpoint(path: str, like):
    """Read a checkpoint written by `save_checkpoint`; `like` is a pytree
    with the same structure (its values provide the treedef).

    Rejects both leaf-count and *structure* mismatches: the stored treedef
    string must equal `like`'s — restoring into a wrong-but-same-arity
    structure would otherwise silently scramble leaves."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    _, treedef = jax.tree_util.tree_flatten(like)
    flat = [
        np.load(os.path.join(path, f"leaf_{i}.npy"))
        for i in range(meta["num_leaves"])
    ]
    if len(flat) != treedef.num_leaves:
        raise ValueError(
            f"checkpoint has {len(flat)} leaves, expected {treedef.num_leaves}"
        )
    stored = meta.get("treedef")
    if stored is not None and stored != str(treedef):
        raise ValueError(
            "checkpoint treedef does not match the `like` structure:\n"
            f"  stored:   {stored}\n  expected: {treedef}"
        )
    return jax.tree_util.tree_unflatten(treedef, flat)


def checkpoint_step(path: str) -> int | None:
    try:
        with open(os.path.join(path, "meta.json")) as fh:
            return json.load(fh).get("step")
    except FileNotFoundError:
        return None
