"""HYLL wire codec — byte-compatible with the reference dump format.

Layout (reference ``hyperloglog.h:11-17``, doc ``hyperloglog.c:65-87``):
16-byte header = magic ``"HYLL"`` + 1 encoding byte + 3 reserved zero bytes
+ 8-byte little-endian cached cardinality whose MSB is a dirty bit
(hyperloglog.c:184-186), followed by the register payload:

- dense (0): 2^p six-bit registers packed LSB-first (hyperloglog.c:88-98)
- sparse (1): run-length opcodes ZERO/XZERO/VAL (hyperloglog.c:100-143)

Compute never happens on these encodings — they are (de)serialized to the
1-byte-per-register raw layout of :mod:`.kernel` (the reference's own
``HLL_RAW`` hot-path layout, hyperloglog.c:920-948). Promotion thresholds
(VAL ceiling 32, sparse max 3000 bytes: hyperloglog.c:641-643,812-813,
redis.c:32) are preserved as *serialization* choices.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kernel import HLL_P_DEFAULT, estimate, m_for_p

MAGIC = b"HYLL"
ENC_DENSE = 0
ENC_SPARSE = 1
ENC_RAW = 255  # internal only, never serialized (hyperloglog.c:197)
HDR_SIZE = 16
SPARSE_VAL_MAX_VALUE = 32
SPARSE_VAL_MAX_LEN = 4
SPARSE_ZERO_MAX_LEN = 64
SPARSE_XZERO_MAX_LEN = 16384
SPARSE_MAX_BYTES = 3000  # server.hll_sparse_max_bytes default (redis.c:32)

CARD_DIRTY_BIT = 1 << 63


class InvalidSketchError(ValueError):
    """Corrupt or non-HYLL blob (mirrors isHLLObjectOrReply, hyperloglog.c:1115-1139)."""


def dense_size(p: int) -> int:
    return (m_for_p(p) * 6 + 7) // 8


def pack_dense(regs: np.ndarray) -> bytes:
    """Raw uint8 registers -> 6-bit LSB-first packed payload.

    Vectorized: 4 registers -> 3 bytes per block (m divisible by 4 for all
    supported p). Matches HLL_DENSE_SET_REGISTER (hyperloglog.c:343-353).
    """
    r = regs.reshape(-1, 4).astype(np.uint16)
    out = np.empty((r.shape[0], 3), dtype=np.uint8)
    out[:, 0] = (r[:, 0] | (r[:, 1] << 6)) & 0xFF
    out[:, 1] = ((r[:, 1] >> 2) | (r[:, 2] << 4)) & 0xFF
    out[:, 2] = ((r[:, 2] >> 4) | (r[:, 3] << 2)) & 0xFF
    return out.tobytes()


def unpack_dense(payload: bytes, p: int) -> np.ndarray:
    m = m_for_p(p)
    if len(payload) != dense_size(p):
        raise InvalidSketchError(f"dense payload length {len(payload)} != {dense_size(p)} for p={p}")
    b = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3).astype(np.uint16)
    regs = np.empty((b.shape[0], 4), dtype=np.uint8)
    regs[:, 0] = b[:, 0] & 0x3F
    regs[:, 1] = ((b[:, 0] >> 6) | (b[:, 1] << 2)) & 0x3F
    regs[:, 2] = ((b[:, 1] >> 4) | (b[:, 2] << 4)) & 0x3F
    regs[:, 3] = (b[:, 2] >> 2) & 0x3F
    return regs.reshape(-1)[:m]


def encode_sparse(regs: np.ndarray) -> bytes | None:
    """Raw registers -> sparse RLE payload, or None if not representable
    (a register > 32) or larger than SPARSE_MAX_BYTES.

    Opcodes (hyperloglog.c:100-143): ZERO ``00xxxxxx`` run 1-64,
    XZERO ``01xxxxxx xxxxxxxx`` run 1-16384, VAL ``1vvvvvxx`` value 1-32
    repeated 1-4.
    """
    if regs.size and int(regs.max()) > SPARSE_VAL_MAX_VALUE:
        return None
    # run boundaries
    change = np.flatnonzero(np.diff(regs.astype(np.int16)) != 0)
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [regs.size]))
    # exact encoded size, vectorized — dense-bound sketches skip the opcode
    # loop entirely (this runs once per group per partition in the hot agg)
    runlens = ends - starts
    is_zero = regs[starts] == 0
    zl = runlens[is_zero]
    nchunks = np.where(zl > SPARSE_ZERO_MAX_LEN, -(-(zl - SPARSE_ZERO_MAX_LEN) // SPARSE_XZERO_MAX_LEN), 0)
    zero_bytes = 2 * nchunks + ((zl - nchunks * SPARSE_XZERO_MAX_LEN) > 0)
    val_bytes = -(-runlens[~is_zero] // SPARSE_VAL_MAX_LEN)
    total_bytes = int(zero_bytes.sum()) + int(val_bytes.sum())
    if total_bytes > SPARSE_MAX_BYTES:
        return None
    out = bytearray()
    for s, e in zip(starts.tolist(), ends.tolist()):
        val = int(regs[s])
        run = e - s
        if val == 0:
            while run > SPARSE_ZERO_MAX_LEN:
                chunk = min(run, SPARSE_XZERO_MAX_LEN)
                l = chunk - 1
                out.append(0x40 | (l >> 8))
                out.append(l & 0xFF)
                run -= chunk
            if run > 0:
                out.append(run - 1)
        else:
            while run > 0:
                chunk = min(run, SPARSE_VAL_MAX_LEN)
                out.append(0x80 | ((val - 1) << 2) | (chunk - 1))
                run -= chunk
        if len(out) > SPARSE_MAX_BYTES:
            return None
    return bytes(out)


def decode_sparse(payload: bytes, p: int | None = None) -> np.ndarray:
    """Sparse RLE payload -> raw registers; validates total run == 2^p
    (mirrors hllSparseToDense, hyperloglog.c:562-614).

    ``p=None`` infers precision from the total run length (the sparse
    encoding is purely positional, so the run total IS m; accepted only if
    it is a power of two in the supported p range 4-18)."""
    m = m_for_p(p) if p is not None else None
    b = np.frombuffer(payload, dtype=np.uint8)
    n = len(b)
    if n == 0:
        raise InvalidSketchError("empty sparse payload")
    # opcode widths: XZERO (01xxxxxx) is 2 bytes, ZERO/VAL are 1. Opcode
    # START positions form the orbit of 0 under i -> i + width(b[i]);
    # enumerate it without a per-opcode Python loop by pointer doubling
    # (the reachable set doubles per numpy round, so log2(#opcodes)
    # gathers of at most #opcodes indices each).
    is_xzero = (b & 0xC0) == 0x40
    if not is_xzero.any():
        starts = np.arange(n, dtype=np.int64)
    else:
        jump = np.full(n + 1, n, dtype=np.int64)
        jump[:n] = np.arange(n, dtype=np.int64) + np.where(is_xzero, 2, 1)
        np.minimum(jump, n, out=jump)
        starts = np.array([0], dtype=np.int64)
        hop = jump
        while True:
            new = hop[starts]
            grown = np.union1d(starts, new[new < n])
            if grown.size == starts.size:
                break
            starts = grown
            hop = hop[np.minimum(hop, n)]  # double the hop distance
        if int(jump[starts[-1]]) < n:
            # orbit stalled before consuming the payload (can't happen for
            # well-formed input; guard against pathological cycles)
            raise InvalidSketchError("sparse opcode stream does not terminate")
    ops = b[starts]
    if bool(is_xzero[starts[-1]]) and int(starts[-1]) + 1 >= n:
        raise InvalidSketchError("truncated XZERO opcode")
    op_is_val = (ops & 0x80) != 0
    op_is_xzero = (ops & 0xC0) == 0x40
    second = b[np.minimum(starts + 1, n - 1)].astype(np.int64)
    runs_arr = np.where(
        op_is_val,
        (ops & 0x3).astype(np.int64) + 1,
        np.where(
            op_is_xzero,
            (((ops & 0x3F).astype(np.int64) << 8) | second) + 1,
            (ops & 0x3F).astype(np.int64) + 1,
        ),
    )
    vals_arr = np.where(op_is_val, ((ops >> 2) & 0x1F).astype(np.uint8) + 1, 0).astype(np.uint8)
    total = int(runs_arr.sum())
    if m is None:
        if total < 16 or total > (1 << 18) or total & (total - 1):
            raise InvalidSketchError(f"sparse runs cover {total} registers, not a supported 2^p")
    elif total != m:
        raise InvalidSketchError(f"sparse runs cover {total} registers, expected {m}")
    return np.repeat(vals_arr, runs_arr)


def _header(encoding: int, card: int | None) -> bytes:
    """Header with cached cardinality; ``card=None`` writes the dirty bit
    (hyperloglog.c:78-87,184-186)."""
    if card is None:
        card_field = CARD_DIRTY_BIT
    else:
        card_field = card & (CARD_DIRTY_BIT - 1)
    return MAGIC + bytes([encoding, 0, 0, 0]) + int(card_field).to_bytes(8, "little")


def serialize(regs: np.ndarray, *, cache_card: bool = True, force_dense: bool = False) -> bytes:
    """Raw registers -> HYLL bytes.

    Picks sparse when representable and smaller than the dense payload
    (promotion thresholds preserved: VAL<=32, <=3000 B), else dense — so a
    low-cardinality per-group sketch costs ~tens of bytes in the shuffle /
    checkpoint instead of 12 KB. A valid cached cardinality is written by
    default, mirroring pfCount's write-back (hyperloglog.c:1234-1267).
    """
    card = estimate(regs) if cache_card else None
    if not force_dense:
        sparse = encode_sparse(regs)
        if sparse is not None and len(sparse) < dense_size(int(regs.size).bit_length() - 1):
            return _header(ENC_SPARSE, card) + sparse
    return _header(ENC_DENSE, card) + pack_dense(regs)


@dataclass
class Sketch:
    regs: np.ndarray
    encoding: int
    cached_card: int | None  # None = dirty

    @property
    def p(self) -> int:
        return int(self.regs.size).bit_length() - 1


def deserialize(blob: bytes, p: int | None = None) -> Sketch:
    """HYLL bytes -> raw registers + metadata, with validation
    (mirrors hllLoad/isHLLObjectOrReply, hyperloglog.c:1115-1152).

    ``p`` defaults to inferring from the payload: dense by payload length,
    sparse by total run length (both uniquely determine m). Pass ``p`` to
    additionally validate the blob against an expected precision.
    """
    if len(blob) < HDR_SIZE:
        raise InvalidSketchError("blob shorter than HYLL header")
    if blob[:4] != MAGIC:
        raise InvalidSketchError("bad magic, expected 'HYLL'")
    encoding = blob[4]
    if encoding > ENC_SPARSE:
        raise InvalidSketchError(f"unknown encoding byte {encoding}")
    card_field = int.from_bytes(blob[8:16], "little")
    cached = None if card_field & CARD_DIRTY_BIT else card_field
    payload = blob[HDR_SIZE:]
    if encoding == ENC_DENSE:
        if p is None:
            # infer m from payload length: len == ceil(m*6/8), m a power of two
            m = len(payload) * 8 // 6
            p = int(m).bit_length() - 1
        regs = unpack_dense(payload, p)
    else:
        regs = decode_sparse(payload, p)
    return Sketch(regs=regs, encoding=encoding, cached_card=cached)


def promote(blob: bytes, p: int | None = None) -> bytes:
    """Force dense encoding; idempotent (mirrors hllSparseToDense /
    hll_promote, hyperloglog.c:562-614, php/hll.c:707-731)."""
    sk = deserialize(blob, p)
    return _header(ENC_DENSE, sk.cached_card) + pack_dense(sk.regs)


def info(blob: bytes, p: int | None = None) -> dict:
    """Encoding / precision / register stats (extends hll_info,
    php/hll.c:734-762 which only reports encoding)."""
    sk = deserialize(blob, p)
    return {
        "encoding": "dense" if sk.encoding == ENC_DENSE else "sparse",
        "p": sk.p,
        "m": int(sk.regs.size),
        "nonzero_registers": int(np.count_nonzero(sk.regs)),
        "estimate": estimate(sk.regs),
        "cached_card": sk.cached_card,
    }
