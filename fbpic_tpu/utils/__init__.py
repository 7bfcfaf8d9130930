from .pytree import pytree_dataclass, static_dataclass
from .dtypes import real_dtype, complex_dtype

__all__ = ["pytree_dataclass", "static_dataclass", "real_dtype", "complex_dtype"]
