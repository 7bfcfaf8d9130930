"""Small helpers to declare JAX-pytree dataclasses.

``pytree_dataclass`` marks every field as a pytree leaf (arrays / child
pytrees); ``static_dataclass`` produces a frozen, hashable dataclass used
for static (compile-time) configuration passed through ``jit`` closures.
"""
import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Decorator: register a dataclass as a JAX pytree.

    Parameters
    ----------
    meta_fields: tuple of str
        Names of fields that are static metadata (hashable, not traced).
    """

    def wrap(c):
        c = dataclasses.dataclass(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        return jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )

    if cls is None:
        return wrap
    return wrap(cls)


def static_dataclass(cls):
    """Decorator: a frozen, hashable dataclass for static configuration."""
    return dataclasses.dataclass(frozen=True, eq=True)(cls)


def replace(obj, **kwargs):
    """dataclasses.replace, re-exported for pytree dataclasses."""
    return dataclasses.replace(obj, **kwargs)
