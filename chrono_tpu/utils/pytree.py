"""Pytree dataclass helper.

All simulation state in chrono_tpu is held in frozen dataclasses registered as JAX
pytrees, so entire scenes can be passed through ``jit`` / ``lax.scan`` / ``grad`` and
sharded with ``jax.sharding``.  This replaces the reference's AoS object graph
(``ChBody``/``ChLink`` pointer soup, see /root/reference/src/chrono/physics/ChAssembly.h)
with a struct-of-arrays pytree design.

Fields marked ``static=True`` are treated as auxiliary (hashable, not traced).
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")

#: class-name → class registry of all pytree dataclasses (the factory the
#: archive layer uses to reconstruct polymorphic objects — the role of the
#: reference's CH_FACTORY_REGISTER, core/ChClassFactory.h)
REGISTRY: dict[str, type] = {}


def static_field(**kwargs):
    """A dataclass field excluded from the pytree leaves (compile-time constant)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Example::

        @pytree_dataclass
        class BodyState:
            x: jax.Array
            q: jax.Array
            n: int = static_field(default=0)
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def _replace(self, **changes):
        return dataclasses.replace(self, **changes)

    cls.replace = _replace
    REGISTRY[cls.__name__] = cls
    return cls
