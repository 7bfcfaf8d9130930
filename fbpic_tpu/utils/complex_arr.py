"""Split-complex arrays: complex arithmetic over pairs of real arrays.

The TPU backend used here has no complex dtype support, and even where
XLA supports complex it lowers to real pairs anyway.  `CArr` stores
re/im as separate real arrays and overloads arithmetic so the spectral
physics formulas read like the complex originals.  This is the
TPU-native generalization of the reference's "unpack complex to stacked
reals before the GEMM" trick
(/root/reference/fbpic/fields/spectral_transform/hankel.py:129-157).

JAX binary ops defer to __r<op>__ of unknown operand types, so
`real_array * CArr`, `1.0j * CArr` etc. all work.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .pytree import pytree_dataclass


@pytree_dataclass
class CArr:
    re: jax.Array
    im: jax.Array

    # ------------------------------------------------------------- meta
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def astype(self, dtype):
        return CArr(self.re.astype(dtype), self.im.astype(dtype))

    def __getitem__(self, idx):
        return CArr(self.re[idx], self.im[idx])

    # -------------------------------------------------------- arithmetic
    def __neg__(self):
        return CArr(-self.re, -self.im)

    def __add__(self, other):
        if isinstance(other, CArr):
            return CArr(self.re + other.re, self.im + other.im)
        if isinstance(other, complex):
            return CArr(self.re + other.real, self.im + other.imag)
        return CArr(self.re + other, self.im)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, CArr):
            return CArr(self.re - other.re, self.im - other.im)
        if isinstance(other, complex):
            return CArr(self.re - other.real, self.im - other.imag)
        return CArr(self.re - other, self.im)

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __mul__(self, other):
        if isinstance(other, CArr):
            return CArr(self.re * other.re - self.im * other.im,
                        self.re * other.im + self.im * other.re)
        if isinstance(other, complex):
            a, b = other.real, other.imag
            # Pure-imaginary and pure-real fast paths (common: 1j * x)
            if a == 0.0:
                return CArr(-b * self.im, b * self.re)
            if b == 0.0:
                return CArr(a * self.re, a * self.im)
            return CArr(a * self.re - b * self.im,
                        a * self.im + b * self.re)
        return CArr(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, CArr):
            d = other.re * other.re + other.im * other.im
            inv = 1.0 / d
            return CArr((self.re * other.re + self.im * other.im) * inv,
                        (self.im * other.re - self.re * other.im) * inv)
        if isinstance(other, complex):
            return self * (1.0 / other)
        return CArr(self.re / other, self.im / other)

    def conj(self):
        return CArr(self.re, -self.im)

    def abs2(self):
        """|z|^2 as a real array."""
        return self.re * self.re + self.im * self.im

    def mul_i(self):
        """Multiply by i (cheaper than 1j * self)."""
        return CArr(-self.im, self.re)

    # --------------------------------------------------------- updates
    def at_add(self, idx, value: "CArr"):
        return CArr(self.re.at[idx].add(value.re),
                    self.im.at[idx].add(value.im))

    def at_set(self, idx, value: "CArr"):
        return CArr(self.re.at[idx].set(value.re),
                    self.im.at[idx].set(value.im))

    def at_mul(self, idx, value):
        if isinstance(value, CArr):
            raise TypeError("at_mul only supports real factors")
        return CArr(self.re.at[idx].mul(value), self.im.at[idx].mul(value))

    # ------------------------------------------------------ conversion
    @staticmethod
    def zeros(shape, dtype):
        return CArr(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @staticmethod
    def zeros_like(other: "CArr"):
        return CArr(jnp.zeros_like(other.re), jnp.zeros_like(other.im))

    @staticmethod
    def from_numpy(arr, dtype):
        """Build from a numpy (complex or real) array."""
        arr = np.asarray(arr)
        return CArr(jnp.asarray(arr.real.copy(), dtype=dtype),
                    jnp.asarray(np.ascontiguousarray(arr.imag), dtype=dtype))

    def to_numpy(self):
        """Return a numpy complex array (host transfer)."""
        re = np.asarray(self.re)
        im = np.asarray(self.im)
        ctype = np.complex128 if re.dtype == np.float64 else np.complex64
        return re.astype(ctype) + 1j * im.astype(ctype)


def cwhere(mask, a, b):
    """Elementwise select over CArr operands."""
    a_re, a_im = (a.re, a.im) if isinstance(a, CArr) else (a, 0.0 * b.re)
    b_re, b_im = (b.re, b.im) if isinstance(b, CArr) else (b, 0.0 * a.im)
    return CArr(jnp.where(mask, a_re, b_re), jnp.where(mask, a_im, b_im))


def cexp_i(phi):
    """exp(i phi) for a real array phi."""
    return CArr(jnp.cos(phi), jnp.sin(phi))
