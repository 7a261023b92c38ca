"""Versioned object archive: any pytree dataclass ↔ JSON.

Counterpart of the reference's ``ChArchive`` + class factory
(/root/reference/src/chrono/serialization/ChArchive.h,
core/ChClassFactory.h): polymorphic, registry-driven (de)serialization of
whole scenes — a ``Model`` with its joints/motors/springs round-trips through
a single JSON document, reconstructing the exact dataclass types via the
pytree registry.  Arrays are stored inline (lists) with dtype tags; binary
bulk state belongs in chrono_tpu.io.checkpoint instead.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.utils.pytree import REGISTRY

ARCHIVE_VERSION = 1


def _encode(obj: Any) -> Any:
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, (jnp.ndarray, np.ndarray)) or hasattr(obj, "dtype"):
        a = np.asarray(obj)
        return {"__array__": a.tolist(), "dtype": str(a.dtype),
                "shape": list(a.shape)}
    if dataclasses.is_dataclass(obj) and type(obj).__name__ in REGISTRY:
        return {
            "__class__": type(obj).__name__,
            "fields": {f.name: _encode(getattr(obj, f.name))
                       for f in dataclasses.fields(obj)},
        }
    if isinstance(obj, dict):
        return {"__dict__": {k: _encode(v) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return {"__seq__": [_encode(v) for v in obj],
                "tuple": isinstance(obj, tuple)}
    raise TypeError(f"cannot archive {type(obj).__name__}: "
                    f"not a registered pytree dataclass or primitive")


def _decode(obj: Any) -> Any:
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if "__array__" in obj:
        a = np.asarray(obj["__array__"], dtype=obj["dtype"])
        return jnp.asarray(a.reshape(obj["shape"]))
    if "__class__" in obj:
        cls = REGISTRY[obj["__class__"]]
        return cls(**{k: _decode(v) for k, v in obj["fields"].items()})
    if "__dict__" in obj:
        return {k: _decode(v) for k, v in obj["__dict__"].items()}
    if "__seq__" in obj:
        seq = [_decode(v) for v in obj["__seq__"]]
        return tuple(seq) if obj["tuple"] else seq
    raise TypeError(f"cannot decode archive node: {obj!r}")


def archive_out(obj: Any, path: str | None = None) -> str:
    """Serialize to a JSON string (optionally writing to ``path``)."""
    doc = {"archive_version": ARCHIVE_VERSION, "root": _encode(obj)}
    s = json.dumps(doc)
    if path is not None:
        with open(path, "w") as f:
            f.write(s)
    return s


def archive_in(source: str) -> Any:
    """Deserialize from a JSON string or a file path."""
    if source.lstrip().startswith("{"):
        doc = json.loads(source)
    else:
        with open(source) as f:
            doc = json.load(f)
    if doc.get("archive_version", 0) > ARCHIVE_VERSION:
        raise ValueError("archive written by a newer version")
    return _decode(doc["root"])
