"""Frozen-dataclass pytree helper.

Components are immutable pytrees: array fields are traced leaves, fields
declared with ``static_field()`` are compile-time metadata (hashable, part of
the jit cache key). This replaces the reference's mutable component classes +
deepcopy-per-evaluation pattern (``ForwardModel_0.py:493-499``).
"""

import dataclasses

import jax


def static_field(**kwargs):
    """Mark a dataclass field as static (non-traced) pytree metadata."""
    metadata = kwargs.pop("metadata", {})
    metadata = dict(metadata)
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with ``static_field`` go into treedef metadata; all other
    fields are child leaves.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = dataclasses.fields(cls)
    data_names = [f.name for f in fields if not f.metadata.get("static", False)]
    meta_names = [f.name for f in fields if f.metadata.get("static", False)]

    jax.tree_util.register_dataclass(
        cls, data_fields=data_names, meta_fields=meta_names
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
