"""Deployment artifacts: freeze a jitted eval forward (weights baked in as
constants) into a single portable file via ``jax.export`` — serialized
StableHLO plus a JSON manifest — and load it back on a serving host that has
neither the model-building code nor the checkpoint.

The reference has no deployment story: its eval loop re-instantiates the
torch module and loads a .pth every time (main.py:884-893). On TPU the
natural unit of deployment is the compiled program itself; ``jax.export``
gives that a stable, versioned serialization (StableHLO + calling
convention) that XLA recompiles on whatever topology loads it.

File layout (single file, ``.mrfpx``):

    8 bytes   magic b"MRFPXPT1"
    4 bytes   little-endian manifest length N
    N bytes   UTF-8 JSON manifest (shapes, dtype, platforms, model id)
    rest      jax.export serialized blob
"""

from __future__ import annotations

import json
import struct
from typing import Callable, Dict, Tuple

_MAGIC = b"MRFPXPT1"


def save_exported(path: str, exported, manifest: Dict) -> None:
    """Write an ``jax.export.Exported`` + manifest to ``path``."""
    blob = exported.serialize()
    meta = json.dumps(manifest).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta)))
        f.write(meta)
        f.write(blob)


def load_exported(path: str) -> Tuple[Callable, Dict]:
    """Load a ``.mrfpx`` artifact; returns ``(fn, manifest)``.

    ``fn(images)`` runs the frozen forward under jit on the current backend
    (the artifact must have been exported for this platform — see the
    manifest's ``platforms``).
    """
    import jax
    from jax import export as jax_export

    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an mrfpx artifact "
                             f"(magic {magic!r})")
        (n,) = struct.unpack("<I", f.read(4))
        manifest = json.loads(f.read(n).decode())
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call), manifest
