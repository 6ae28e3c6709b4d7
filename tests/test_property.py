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


# ---------------------------------------------------------------------------
# Round-3 additions: word/char shingle windows, theta algebra
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=60,
    ),
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=6))
def test_char_windows_match_python_reference(texts, k):
    """Char k-gram windows over the UTF-8 buffer == Python slicing over
    code points, for arbitrary unicode (incl. astral plane), any k."""
    from phphll_spark.functions.similarity import (
        _char_shingle_windows_from_buffers,
        _docs_to_buffers,
    )

    bs = [t.encode("utf-8") for t in texts]
    buf, off, lens = _docs_to_buffers(bs)
    starts, wlens, counts = _char_shingle_windows_from_buffers(buf, off, lens, k)
    pos = 0
    for t, c in zip(texts, counts):
        exp = (
            []
            if not t
            else ([t] if len(t) < k else [t[i : i + k] for i in range(len(t) - k + 1)])
        )
        got = []
        for _ in range(c):
            s, l = starts[pos], wlens[pos]
            got.append(bytes(buf[s : s + l]).decode("utf-8"))
            pos += 1
        assert got == exp, (t, k, got, exp)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcdefgh√ü√∂‚Ç¨", min_size=1, max_size=5), max_size=20
        ),
        max_size=8,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_word_windows_match_python_reference(word_lists, n):
    """Word n-gram windows over normalized text == Python word slicing."""
    from phphll_spark.functions.similarity import (
        _docs_to_buffers,
        _word_shingle_windows_from_buffers,
    )

    texts = [" ".join(ws) for ws in word_lists]
    bs = [t.encode("utf-8") for t in texts]
    buf, off, lens = _docs_to_buffers(bs)
    starts, wlens, counts = _word_shingle_windows_from_buffers(buf, off, lens, n)
    pos = 0
    for ws, c in zip(word_lists, counts):
        exp = (
            []
            if not ws
            else (
                [" ".join(ws)]
                if len(ws) < n
                else [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
            )
        )
        got = []
        for _ in range(c):
            s, l = starts[pos], wlens[pos]
            got.append(bytes(buf[s : s + l]).decode("utf-8"))
            pos += 1
        assert got == exp, (ws, n, got, exp)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=2000),
    st.integers(min_value=8, max_value=256),
    st.integers(min_value=2, max_value=6),
)
def test_theta_split_merge_invariance(seed, n, k, splits):
    """Theta algebra: folding a random hash stream in arbitrary chunkings
    and merge orders is bit-identical, and the exact regime is exact."""
    from phphll_spark.sketches.theta import (
        _THETA_ONE,
        theta_estimate_state,
        theta_fold,
        theta_merge,
        theta_serialize,
    )

    rng = np.random.default_rng(seed)
    hashes = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    empty = np.empty(0, dtype=np.uint64)
    whole = theta_fold(empty, _THETA_ONE, hashes, k)
    chunks = np.array_split(hashes, splits)
    states = [theta_fold(empty, _THETA_ONE, ch, k) for ch in chunks]
    order = rng.permutation(len(states))
    acc = states[order[0]]
    for i in order[1:]:
        acc = theta_merge(acc, states[i], k)
    assert theta_serialize(*whole, k) == theta_serialize(*acc, k)
    distinct = len(np.unique(hashes))
    if distinct <= k:
        assert theta_estimate_state(*whole) == distinct
