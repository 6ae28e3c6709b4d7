"""HYLL codec: dense/sparse round-trips, header semantics, validation,
promotion — mirrors hll_dump_load.phpt, hll_obj_unserialize.phpt,
hll_count_invalid.phpt, hll_promote.phpt, hll_info.phpt and the 6-bit
packing half of pfselftest (hyperloglog.c:1586-1609)."""

import numpy as np
import pytest

from phphll_spark import codec, kernel
from phphll_spark.hll import HLL


def _sketch_with(n, tag=b"t"):
    regs = kernel.empty_registers()
    data, offsets = kernel.bytes_to_buffers([tag + b"%d" % i for i in range(n)])
    kernel.add_bytes(regs, data, offsets)
    return regs


def test_dense_pack_roundtrip_random_registers():
    """1000 random register patterns through the 6-bit packing
    (pfselftest part 1, hyperloglog.c:1586-1609)."""
    rng = np.random.default_rng(11)
    for _ in range(50):
        regs = rng.integers(0, 64, size=16384, dtype=np.uint8)
        assert (codec.unpack_dense(codec.pack_dense(regs), 14) == regs).all()


def test_dense_pack_roundtrip_all_p():
    rng = np.random.default_rng(12)
    for p in range(4, 19):
        regs = rng.integers(0, 64, size=1 << p, dtype=np.uint8)
        assert (codec.unpack_dense(codec.pack_dense(regs), p) == regs).all()


def test_sparse_roundtrip():
    for n in (0, 1, 5, 100, 1000):
        regs = _sketch_with(n)
        payload = codec.encode_sparse(regs)
        assert payload is not None
        assert (codec.decode_sparse(payload, 14) == regs).all()


def test_sparse_not_representable_high_register():
    regs = kernel.empty_registers()
    regs[7] = 33  # beyond VAL ceiling 32 → must go dense (hyperloglog.c:641-643)
    assert codec.encode_sparse(regs) is None


def test_sparse_empty_is_xzero_16384():
    """Empty sketch = XZERO:16384 (hyperloglog.c:131-132, 1088-1104)."""
    payload = codec.encode_sparse(kernel.empty_registers())
    assert payload == bytes([0x40 | ((16384 - 1) >> 8), (16384 - 1) & 0xFF])


def test_serialize_picks_sparse_when_small_dense_when_big():
    small = codec.serialize(_sketch_with(100))
    assert small[4] == codec.ENC_SPARSE
    assert len(small) < 600
    big = codec.serialize(_sketch_with(100000))
    assert big[4] == codec.ENC_DENSE
    assert len(big) == codec.HDR_SIZE + codec.dense_size(14)


def test_roundtrip_preserves_count_exactly():
    """Mirrors hll_dump_load.phpt: 10k unique / 100x100 repeated / empty."""
    cases = [
        [b"u%d" % i for i in range(10000)],
        [b"r%d" % (i % 100) for i in range(10000)],
        [],
    ]
    for items in cases:
        regs = kernel.empty_registers()
        data, offsets = kernel.bytes_to_buffers(items)
        kernel.add_bytes(regs, data, offsets)
        for force_dense in (False, True):
            blob = codec.serialize(regs, force_dense=force_dense)
            back = codec.deserialize(blob)
            assert (back.regs == regs).all()
            assert kernel.estimate(back.regs) == kernel.estimate(regs)


def test_header_cached_cardinality():
    regs = _sketch_with(500)
    blob = codec.serialize(regs, cache_card=True)
    sk = codec.deserialize(blob)
    assert sk.cached_card == kernel.estimate(regs)
    dirty = codec.serialize(regs, cache_card=False)
    assert codec.deserialize(dirty).cached_card is None
    assert dirty[15] & 0x80  # MSB dirty bit set (hyperloglog.c:184-186)


def test_validation_rejects_corrupt():
    with pytest.raises(codec.InvalidSketchError):
        codec.deserialize(b"NOPE" + bytes(20))
    with pytest.raises(codec.InvalidSketchError):
        codec.deserialize(b"HY")
    blob = bytearray(codec.serialize(_sketch_with(10)))
    blob[4] = 7  # bad encoding byte
    with pytest.raises(codec.InvalidSketchError):
        codec.deserialize(bytes(blob))
    # dense with truncated payload
    dense = bytearray(codec.serialize(_sketch_with(10), force_dense=True))
    with pytest.raises(codec.InvalidSketchError):
        codec.deserialize(bytes(dense[:-5]), 14)
    # sparse runs not covering exactly m registers
    bad_sparse = codec._header(codec.ENC_SPARSE, None) + bytes([0x40, 0xFF])
    with pytest.raises(codec.InvalidSketchError):
        codec.deserialize(bad_sparse, 14)


def test_promote_idempotent():
    blob = codec.serialize(_sketch_with(50))
    assert blob[4] == codec.ENC_SPARSE
    d1 = codec.promote(blob)
    d2 = codec.promote(d1)
    assert d1[4] == codec.ENC_DENSE
    assert d1 == d2
    assert (codec.deserialize(d1).regs == codec.deserialize(blob).regs).all()


def test_info():
    got = codec.info(codec.serialize(_sketch_with(100)))
    assert got["encoding"] == "sparse"
    assert got["p"] == 14 and got["m"] == 16384
    assert abs(got["estimate"] - 100) <= 2


def test_sparse_p_inference():
    """Sparse payloads self-describe m via their total run length — a p=10
    sketch round-trips through deserialize with NO p argument (regression:
    the merge agg used to assume p=14 for sparse blobs)."""
    for p in (4, 10, 16):
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[:3] = 5
        blob = codec.serialize(regs)
        assert blob[4] == codec.ENC_SPARSE
        sk = codec.deserialize(blob)  # p inferred from run total
        assert sk.p == p and (sk.regs == regs).all()
        # explicit-but-wrong p still rejects
        with pytest.raises(codec.InvalidSketchError):
            codec.deserialize(blob, p + 1)
    # inferred path still rejects non-power-of-two coverage
    bad = codec._header(codec.ENC_SPARSE, None) + bytes([0x40, 0xFE])  # 255 regs
    with pytest.raises(codec.InvalidSketchError):
        codec.deserialize(bad)


def test_dense_size_inference():
    for p in (10, 14, 16):
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[: 1 << (p - 2)] = 40  # force dense
        blob = codec.serialize(regs)
        sk = codec.deserialize(blob)  # p inferred from payload length
        assert sk.p == p
