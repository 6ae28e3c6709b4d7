"""Local HLL class parity with the reference PHP golden tests
(/root/reference/php/tests/*.phpt). Each test names the golden it mirrors."""

import gzip
import os

import pytest

from phphll_spark import codec as codec_mod
from phphll_spark.hll import HLL, hll_count, hll_merge, php_string

WORDS_GZ = "/root/reference/php/tests/words.gz"


def test_add_distinct():
    """hll_add_distinct.phpt: 4 distinct strings -> 4."""
    h = HLL()
    for w in ("abc", "def", "ghi", "jkl"):
        h.add(w)
    assert h.count() == 4


def test_add_string_empty_identity():
    """hll_add_string.phpt: "" is a countable element distinct from "a"."""
    h = HLL()
    h.add("")
    h.add("")
    assert h.count() == 1
    h2 = HLL()
    h2.add("")
    h2.add("a")
    assert h2.count() == 2


def test_updated_flag():
    """hll_add_oo.phpt: updated true then false for a duplicate."""
    h = HLL()
    assert h.add("abc") is True
    assert h.add("abc") is False


def test_add_empty_array_noop():
    """hll_add_empty_array.phpt."""
    h = HLL()
    assert h.add([]) is False
    assert h.count() == 0


def test_add_array():
    h = HLL()
    h.add(["a", "b", "c", "a"])
    assert h.count() == 3


def test_count_merged():
    """hll_count_merged.phpt: 2-way union -> 3, 3-way -> 4."""
    a = HLL(); a.add(["abc", "def"])
    b = HLL(); b.add(["def", "ghi"])
    assert hll_count(a, b) == 3
    c = HLL(); c.add(["ghi", "jkl"])
    assert hll_count(a, b, c) == 4
    # inputs untouched (pfCountMerged mutates nothing, hyperloglog.c:1274-1304)
    assert a.count() == 2 and b.count() == 2 and c.count() == 2


def test_merge_oo_semantics():
    """hll_merge_oo.phpt: cumulative merge, merge into blank, self-merge
    identity, fluent return."""
    a = HLL(); a.add(["abc", "def"])
    b = HLL(); b.add(["def", "ghi"])
    assert a.merge(b) is a
    assert a.count() == 3
    blank = HLL()
    blank.merge(a)
    assert blank.count() == 3
    before = a.count()
    a.merge(a)  # into itself
    assert a.count() == before


def test_merge_negative_empty():
    """hll_merge_negative.phpt: union of empties = 0."""
    assert hll_merge(HLL(), HLL()).count() == 0
    assert hll_count(HLL(), HLL()) == 0


def test_merge_none_treated_as_empty():
    """pfMerge NULL source = empty sketch (hyperloglog.c:1293,1319)."""
    a = HLL(); a.add(["x", "y"])
    assert hll_count(a, None) == 2


def test_type_coercion_goldens():
    """hll_add_int/float/bool_conversion.phpt."""
    pairs = [(100, "100"), (100.1, "100.1"), (True, "1"), (False, "")]
    for scalar, string in pairs:
        h = HLL()
        h.add(scalar)
        h.add(string)
        assert h.count() == 1, (scalar, string)
    assert php_string(None) == ""
    assert php_string(1e20) == "1.0E+20"
    assert php_string(0.30000000000000004) == "0.3"  # PHP precision=14


def test_add_object_raises():
    """hll_add_object.phpt / hll_add_resource.phpt: non-stringable errors."""
    h = HLL()
    with pytest.raises(TypeError):
        h.add(object())
    assert h.count() == 0


def test_tolerance_10k_sequential_ints():
    """hll_add_many_distinct.phpt: 10k sequential ints within 1%."""
    h = HLL()
    h.add([str(i) for i in range(10000)])
    assert abs(h.count() - 10000) <= 100


@pytest.mark.skipif(not os.path.exists(WORDS_GZ), reason="reference corpus absent")
def test_tolerance_words_corpus():
    """hll_add_many_mixed.phpt: words.gz, 72786 lines / 12238 unique, 1%."""
    with gzip.open(WORDS_GZ, "rb") as f:
        words = f.read().splitlines()
    assert len(words) == 72786
    h = HLL()
    h.add([w.decode("utf-8", "surrogateescape") for w in words])
    assert abs(h.count() - 12238) <= 123  # within_tolerance 1% (helpers.inc:13-16)


def test_create_encodings_and_promote():
    """hll_create_dense.phpt / hll_create_sparse.phpt / hll_promote.phpt /
    hll_info.phpt: dense by default (php/hll.c:76-83), promote idempotent."""
    assert HLL().info() == {"encoding": "dense"}
    s = HLL(sparse=True)
    assert s.info() == {"encoding": "sparse"}
    s.promote()
    assert s.info() == {"encoding": "dense"}
    s.promote()
    assert s.info() == {"encoding": "dense"}


def test_sparse_auto_promotion_on_growth():
    s = HLL(sparse=True)
    s.add([str(i) for i in range(5000)])  # sparse blob would exceed 3000 B
    assert s.info() == {"encoding": "dense"}


def test_dump_load_roundtrip():
    """hll_dump_load.phpt: count preserved exactly, sparse and dense."""
    for items in ([f"u{i}" for i in range(10000)], [f"r{i % 100}" for i in range(10000)], []):
        for sparse in (False, True):
            h = HLL(sparse=sparse)
            if items:
                h.add(items)
            back = HLL.load(h.dump())
            assert back.count() == h.count()


def test_merge_construct():
    a = HLL(); a.add(["x", "y"])
    b = HLL(); b.add(["y", "z"])
    merged = HLL([a, b])
    assert merged.count() == 3


def test_serialized_construct():
    a = HLL(); a.add(["p", "q", "r"])
    b = HLL(a.dump())
    assert b.count() == 3


def test_count_of_loaded_uses_cache():
    a = HLL(); a.add([str(i) for i in range(1000)])
    blob = a.dump()
    b = HLL(blob)
    assert b._cached is not None  # cache honored on load (hyperloglog.c:1234-1267)
    assert b.count() == a.count()


def test_add_object_stringable():
    """hll_add_object_stringable.phpt: objects defining __str__ coerce to
    their string form (PHP __toString); value-equal to the plain string."""
    class Doc:
        def __str__(self):
            return "hello"

    h = HLL()
    h.add(Doc())
    h.add("hello")
    assert h.count() == 1
    # a class with only __repr__ still errors (no explicit __toString)
    class NoStr:
        def __repr__(self):
            return "nope"

    with pytest.raises(TypeError):
        HLL().add(NoStr())


def test_add_mem_flat():
    """hll_add_mem.phpt: memory stays flat over 50k adds — register array
    size and dump size are O(1) regardless of input volume."""
    h = HLL()
    h.add([str(i) for i in range(50000)])
    assert h.regs.nbytes == 16384  # raw accumulator never grows
    assert len(h.dump()) == 16 + 12288  # dense HYLL dump is fixed-size


def test_merge_func_forms():
    """hll_merge_func.phpt / hll_merge_mixed.phpt: pure hll_merge over
    variadic args, a single list, and mixed HLL objects + HYLL blobs."""
    a = HLL(); a.add(["x", "y"])
    b = HLL(); b.add(["y", "z"])
    assert hll_merge(a, b).count() == 3
    assert hll_merge([a, b]).count() == 3          # args-or-array
    assert hll_merge(a, b.dump()).count() == 3     # mixed object + blob
    assert a.count() == 2 and b.count() == 2       # inputs untouched


def test_pickle_roundtrip():
    """hll_obj_serialize.phpt / hll_obj_unserialize.phpt: serialize hooks —
    pickling goes through the validated HYLL dump."""
    import pickle

    h = HLL()
    h.add([str(i) for i in range(1000)])
    back = pickle.loads(pickle.dumps(h))
    assert back.count() == h.count()
    assert (back.regs == h.regs).all()
    with pytest.raises(codec_mod.InvalidSketchError):
        HLL(b"HYLLgarbage_that_is_not_valid")
