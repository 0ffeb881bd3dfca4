"""Full-state checkpoint / resume.

reference: the C++ library persists only maps (versioned .smd,
src/sdm/map.cpp:490-575); poses and filter state are not checkpointed
(SURVEY §5). This build adds full-state checkpoints: any pytree of arrays
(SlamMapState, ParticleSet, pose-graph arrays) round-trips through a single
compressed archive, so SLAM runs resume exactly — including across process
restarts of a TPU job.

Format: a .npz of the flattened pytree leaves (keypath-encoded names);
native-LZ4-compressed sidecar optional via utils/codec.py.
"""

from __future__ import annotations

import io
from typing import Any

import jax
import numpy as np

from .codec import BufferCompressor


def _leaf_names(tree) -> list:
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = []
    for path, _ in paths:
        parts = []
        for p in path:
            if hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p))
        names.append("/".join(parts) or "leaf")
    return names


def save_state(path: str, tree: Any, compress: bool = False) -> None:
    leaves = jax.tree_util.tree_leaves(tree)
    names = _leaf_names(tree)
    arrays = {f"{i:04d}:{n}": np.asarray(l) for i, (n, l) in
              enumerate(zip(names, leaves))}
    if compress:
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        raw = buf.getvalue()
        bc = BufferCompressor("lz4")
        comp = bc.compress(raw)
        with open(path, "wb") as f:
            f.write(b"LMC1")
            f.write(len(raw).to_bytes(8, "little"))
            f.write(comp)
    else:
        with open(path, "wb") as f:
            np.savez(f, **arrays)


def load_state(path: str, like: Any) -> Any:
    """Load a checkpoint into the structure of ``like`` (same pytree def)."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head == b"LMC1":
            raw_len = int.from_bytes(f.read(8), "little")
            comp = f.read()
            bc = BufferCompressor("lz4")
            raw = bc.decompress(comp, raw_len)
            data = np.load(io.BytesIO(raw))
        else:
            f.seek(0)
            data = np.load(f)
        keys = sorted(data.files)
        leaves = [data[k] for k in keys]
    treedef = jax.tree_util.tree_structure(like)
    ref_leaves = jax.tree_util.tree_leaves(like)
    assert len(leaves) == len(ref_leaves), (
        f"checkpoint has {len(leaves)} leaves, structure needs "
        f"{len(ref_leaves)}")
    import jax.numpy as jnp
    out = [jnp.asarray(l.astype(r.dtype) if hasattr(r, "dtype") else l)
           for l, r in zip(leaves, ref_leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)
