"""Hypothesis property tests for the sketch algebra — the invariants the
distributed correctness rests on (north star: "merge associativity across
arbitrary partition groupings")."""

import numpy as np
from hypothesis import given, settings, strategies as st

from phphll_spark import codec, kernel


def regs_strategy(p=14):
    m = 1 << p
    return st.builds(
        lambda nz, seed: _regs(m, nz, seed),
        nz=st.integers(min_value=0, max_value=4000),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )


def _regs(m, nz, seed):
    rng = np.random.default_rng(seed)
    regs = np.zeros(m, dtype=np.uint8)
    if nz:
        pos = rng.choice(m, size=min(nz, m), replace=False)
        regs[pos] = rng.integers(1, 52, size=len(pos))  # rho <= 64-14+1+1
    return regs


@settings(max_examples=40, deadline=None)
@given(regs_strategy())
def test_serialize_roundtrip_any_registers(regs):
    """serialize -> deserialize is the identity on registers, for whatever
    encoding serialize picks, and the cached card matches the estimate."""
    blob = codec.serialize(regs)
    sk = codec.deserialize(blob)
    assert (sk.regs == regs).all()
    assert sk.cached_card == kernel.estimate(regs)
    # force-dense path agrees
    dsk = codec.deserialize(codec.serialize(regs, force_dense=True))
    assert (dsk.regs == regs).all()


@settings(max_examples=40, deadline=None)
@given(regs_strategy(), regs_strategy(), regs_strategy())
def test_merge_associative_commutative_idempotent(a, b, c):
    m = kernel.merge_registers
    assert (m(m(a, b), c) == m(a, m(b, c))).all()
    assert (m(a, b) == m(b, a)).all()
    assert (m(a, a) == a).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=200),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_partition_grouping_invariance(items, seed):
    """Folding the same multiset through ANY partitioning then merging
    gives register-identical results to a single serial fold."""
    serial = kernel.empty_registers()
    data, offsets = kernel.bytes_to_buffers(items)
    kernel.add_bytes(serial, data, offsets)

    rng = np.random.default_rng(seed)
    n_parts = int(rng.integers(1, 8))
    parts = [[] for _ in range(n_parts)]
    for it in items:
        parts[int(rng.integers(0, n_parts))].append(it)
    acc = kernel.empty_registers()
    for part in parts:
        regs = kernel.empty_registers()
        d, o = kernel.bytes_to_buffers(part)
        kernel.add_bytes(regs, d, o)
        acc = kernel.merge_registers(acc, regs)
    assert (acc == serial).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=300))
def test_windows_hash_matches_scalar(items):
    """The batched gather murmur equals the per-element hash for arbitrary
    (incl. empty / sub-8-byte / unaligned) byte strings."""
    data, offsets = kernel.bytes_to_buffers(items)
    batched = kernel.murmur64a(data, offsets)
    for i, it in enumerate(items):
        assert int(batched[i]) == kernel.hash_one(it)
