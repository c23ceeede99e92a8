"""Arithmetic domains: power-of-2 multiplicative cosets offset*<omega>.

Mirrors /root/reference/triton-vm/src/arithmetic_domain.rs:34-296 (same
observable semantics: value ordering, zerofier shape, pow rule), with the
heavy evaluate/interpolate paths running on device via triton_vm_tpu.ops.ntt.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields import bfe, poly
from ..fields.bfe import P


@dataclass(frozen=True)
class Domain:
    length: int
    offset: int = 1

    def __post_init__(self):
        if self.length < 1 or self.length & (self.length - 1):
            raise ValueError(f"domain length must be a power of 2: {self.length}")
        if self.length > 1 << 32:
            raise ValueError("domain length exceeds 2^32")
        if self.offset % P == 0:
            raise ValueError("domain offset must be nonzero")

    @property
    def generator(self) -> int:
        return bfe.primitive_root_of_unity(self.length)

    def with_offset(self, offset: int) -> "Domain":
        return Domain(self.length, offset % P)

    def value(self, n: int) -> int:
        return pow(self.generator, n, P) * self.offset % P

    def values(self) -> list[int]:
        out = []
        acc = 1
        g = self.generator
        for _ in range(self.length):
            out.append(acc * self.offset % P)
            acc = acc * g % P
        return out

    def zerofier(self):
        """x^n - offset^n as a host polynomial."""
        z = [0] * (self.length + 1)
        z[0] = bfe.neg(pow(self.offset, self.length, P))
        z[-1] = 1
        return z

    def zerofier_at(self, x):
        """Evaluate the zerofier at an XFE point (verifier hot path)."""
        from ..fields import xfe
        xn = xfe.mod_pow(x, self.length)
        return xfe.sub(xn, xfe.lift(pow(self.offset, self.length, P)))

    def pow(self, exponent: int) -> "Domain":
        if exponent < 1 or exponent & (exponent - 1):
            raise ValueError("exponent must be a power of two")
        return Domain(max(1, self.length // exponent),
                      pow(self.offset, exponent, P))

    def halve(self) -> "Domain":
        return self.pow(2)

    # ----------------------------------------------------------- host paths

    def evaluate_host(self, coeffs, F=bfe):
        """Chunked coset evaluation of a host polynomial, handling
        degree >= length like the reference (arithmetic_domain.rs:141-170)."""
        values = [poly._zero(F)] * self.length
        chunks = [coeffs[i:i + self.length]
                  for i in range(0, max(len(coeffs), 1), self.length)]
        xs = self.values()
        for k, chunk in enumerate(chunks):
            scaled = pow(self.offset, k * self.length, P)
            for i, x in enumerate(xs):
                v = poly.evaluate(chunk, x, F) if F is bfe else None
                if F is bfe:
                    values[i] = (values[i] + v * scaled) % P
                else:
                    from ..fields import xfe
                    v = poly.evaluate(chunk, xfe.lift(x), F)
                    values[i] = xfe.add(values[i], xfe.bfe_mul(v, scaled))
        return values

    def interpolate_host(self, values, F=bfe):
        if F is bfe:
            return poly.interpolate(self.values(), values, F)
        from ..fields import xfe
        xs = [xfe.lift(v) for v in self.values()]
        return poly.interpolate(xs, values, F)
