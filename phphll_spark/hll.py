"""Local (single-process) HLL object mirroring the reference PHP API.

This is the parity-test target for the distributed aggregation: the same
kernel the Spark UDFs use, wrapped in the reference's object surface
(``HyperLogLog`` class / ``hll_*`` functions, php/hll.c:380-814). It is
also handy inside tests and driver-side code; the distributed hot path
never constructs per-row objects.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from . import codec, kernel
from .kernel import HLL_P_DEFAULT


def php_string(value) -> str:
    """PHP scalar->string coercion — the element-identity rule
    (php/hll.c:273-298; golden tests hll_add_*_conversion.phpt):

    - None -> "" (PHP null), True -> "1", False -> ""
    - int -> decimal string
    - float -> PHP's %.14G rendering (precision=14 default)
    - str passes through
    """
    if value is None:
        return ""
    if value is True:
        return "1"
    if value is False:
        return ""
    if isinstance(value, str):
        return value
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        s = "%.14G" % value
        # PHP renders exponent-form doubles like 1.0E+20, printf gives 1E+20
        if "E" in s and "." not in s.split("E")[0]:
            mant, exp = s.split("E")
            s = f"{mant}.0E{exp}"
        return s
    # objects that define their own __str__ coerce like PHP objects with
    # __toString (hll_add_object_stringable.phpt); bare objects error
    # (hll_add_object.phpt / hll_add_resource.phpt)
    if type(value).__str__ is not object.__str__:
        return str(value)
    raise TypeError(f"cannot coerce {type(value).__name__} to an HLL element "
                    "(mirrors hll_add_object.phpt / hll_add_resource.phpt)")


def element_bytes(value) -> bytes:
    """Canonical hashed form: UTF-8 bytes of the PHP string rendering.

    NB divergence, documented in SURVEY.md §2.4: the reference's PHP scalar
    path truncates at the first NUL (sdsnew, php/hll.c:288); we are
    binary-safe like the C core itself (hllcnt.c:18).
    """
    if isinstance(value, bytes):
        return value
    return php_string(value).encode("utf-8")


class HLL:
    """Mirror of the reference ``HyperLogLog`` class (php/hll.c:380-436).

    Dense by default like the PHP binding (php/hll.c:76-83 — unlike Redis);
    ``sparse=True`` starts sparse, with automatic conceptual promotion
    reflected at serialization time.
    """

    def __init__(self, arg=None, *, p: int = HLL_P_DEFAULT, sparse: bool = False):
        if isinstance(arg, (bytes, bytearray)):  # deserialize-construct
            sk = codec.deserialize(bytes(arg), None)
            self._p = sk.p
            self._cached = sk.cached_card
            if sk.encoding == codec.ENC_SPARSE:
                # keep the serialized RLE as the LIVE representation —
                # byte-level continuity with the stored object, like the
                # reference mutating the loaded sds in place
                self._sparse_blob: bytearray | None = bytearray(bytes(arg))
                self._regs = None
            else:
                self._sparse_blob = None
                self._regs = sk.regs
            return
        self._p = p
        self._cached = 0  # empty sketch counts 0, cache valid
        if sparse:
            # hllCreate()'s exact initial bytes (hyperloglog.c:1083-1113)
            self._sparse_blob = bytearray(
                codec.MAGIC
                + bytes([codec.ENC_SPARSE, 0, 0, 0])
                + (0).to_bytes(8, "little")
                + codec.empty_sparse_payload(p)
            )
            self._regs = None
        else:
            self._sparse_blob = None
            self._regs = kernel.empty_registers(p)
        if arg is not None:  # merge-construct from an iterable of HLLs/bytes
            self.merge(*list(arg))

    @property
    def regs(self) -> np.ndarray:
        """Raw registers; decoded on demand while the sketch lives in its
        byte-level sparse form."""
        if self._sparse_blob is not None:
            return codec.decode_sparse(bytes(self._sparse_blob[codec.HDR_SIZE:]), self._p)
        return self._regs

    @regs.setter
    def regs(self, value: np.ndarray) -> None:
        self._regs = value
        self._sparse_blob = None
        self._p = int(value.size).bit_length() - 1

    @property
    def p(self) -> int:
        return self._p

    def add(self, value) -> bool:
        """Add one element, or each element of a list/tuple; returns True
        iff any register changed (the by-ref ``updated`` flag,
        php/hll.c:618-623). Empty array is a no-op
        (hll_add_empty_array.phpt).

        Sparse sketches take the reference's byte-level RLE splice per
        element (hllSparseSet, hyperloglog.c:632-876 — see codec.sparse_set)
        and promote to dense mid-batch on VAL overflow or the 3000-byte
        ceiling, after which the remainder folds vectorized."""
        values = value if isinstance(value, (list, tuple)) else [value]
        if not values:
            return False
        data, offsets = kernel.bytes_to_buffers([element_bytes(v) for v in values])
        changed = False
        if self._sparse_blob is not None:
            idx, rho = kernel.hash_idx_rho(kernel.murmur64a(data, offsets), self._p)
            for i in range(len(idx)):
                r = codec.sparse_set(self._sparse_blob, int(idx[i]), int(rho[i]))
                if r == 1:
                    changed = True
                elif r == -1:  # promote (hllSparseToDense) and finish dense
                    self._regs = codec.decode_sparse(
                        bytes(self._sparse_blob[codec.HDR_SIZE:]), self._p
                    )
                    self._sparse_blob = None
                    before = self._regs.copy()
                    kernel.update_registers(self._regs, idx[i:], rho[i:])
                    changed = changed or bool((self._regs != before).any())
                    break
        else:
            before = self._regs.copy()
            kernel.add_bytes(self._regs, data, offsets, self._p)
            changed = bool((self._regs != before).any())
        if changed:
            self._cached = None  # invalidate cache (hyperloglog.c:1184-1188)
        return changed

    def count(self) -> int:
        """Estimate; serves the cached value when clean and writes it back
        after recomputing (pfCount, hyperloglog.c:1223-1268)."""
        if self._cached is None:
            self._cached = kernel.estimate(self.regs)
        return self._cached

    def merge(self, *others) -> "HLL":
        """In-place union, fluent return (php/hll.c:463-585). Accepts HLL
        objects, HYLL byte blobs, or a single list of them; None is treated
        as an empty sketch (hyperloglog.c:1293,1319). Merge destinations go
        dense (hyperloglog.c:1328-1331)."""
        if len(others) == 1 and isinstance(others[0], (list, tuple)):
            others = tuple(others[0])
        for other in others:
            if other is None:
                continue
            if isinstance(other, (bytes, bytearray)):
                other_regs = codec.deserialize(bytes(other), None).regs
            elif isinstance(other, HLL):
                other_regs = other.regs
            else:
                raise TypeError(f"cannot merge {type(other).__name__}")
            self.regs = kernel.merge_registers(self.regs, other_regs)
        self._cached = None
        return self  # merge destinations are dense (regs setter drops RLE)

    def promote(self) -> "HLL":
        """Force dense; idempotent (hll_promote.phpt)."""
        if self._sparse_blob is not None:
            self.regs = codec.decode_sparse(
                bytes(self._sparse_blob[codec.HDR_SIZE:]), self._p
            )
        return self

    def info(self) -> dict:
        enc = "sparse" if self._sparse_blob is not None else "dense"
        return {"encoding": enc}

    def dump(self) -> bytes:
        """HYLL bytes honoring the current encoding and cache state
        (php/hll.c:766-791)."""
        if self._sparse_blob is not None:
            card = self._cached if self._cached is not None else kernel.estimate(self.regs)
            return codec._header(codec.ENC_SPARSE, card) + bytes(
                self._sparse_blob[codec.HDR_SIZE:]
            )
        return codec.serialize(self._regs, cache_card=True, force_dense=True)

    @classmethod
    def load(cls, blob: bytes) -> "HLL":
        """Validated deserialize (hll_load, php/hll.c:793-814)."""
        return cls(blob)

    def __reduce__(self):
        """Pickle via the HYLL dump — the analog of the reference's PHP
        serialize()/unserialize() hooks (php/hll.c:97-163,
        hll_obj_serialize.phpt); also what lets executors ship an HLL in
        a closure safely."""
        return (type(self), (self.dump(),))

    @classmethod
    def merge_all(cls, sketches: Iterable) -> "HLL":
        out = cls()
        return out.merge(list(sketches))


def hll_count(*sketches) -> int:
    """Variadic union cardinality (hll_count / pfCountMerged,
    php/hll.c:660-704, hyperloglog.c:1274-1304). Inputs untouched."""
    if len(sketches) == 1:
        s = sketches[0]
        return s.count() if isinstance(s, HLL) else HLL(bytes(s)).count()
    acc = None
    for s in sketches:
        if s is None:
            continue
        regs = s.regs if isinstance(s, HLL) else codec.deserialize(bytes(s)).regs
        acc = regs.copy() if acc is None else kernel.merge_registers(acc, regs)
    if acc is None:
        return 0
    return kernel.estimate(acc)


def hll_merge(*sketches) -> HLL:
    """Pure merge returning a new sketch; accepts variadic args or a single
    list, HLL objects or HYLL blobs mixed (hll_merge_func.phpt /
    hll_merge_mixed.phpt)."""
    if len(sketches) == 1 and isinstance(sketches[0], (list, tuple)):
        sketches = tuple(sketches[0])
    return HLL.merge_all([s for s in sketches if s is not None])
