"""Cuckoo filter properties (sparkcrawl/cuckoo.py — the deletion-capable
half of the north star's "bloom/cuckoo-filter URL-seen set"):

- no false negatives for inserted keys (hard invariant, same as bloom)
- deletion of SOME inserted keys never creates a false negative for the
  REST (the property that makes in-place seen-TTL maintenance sound)
- serialization round-trip, blob determinism for a fixed insert order
- stash engages past table capacity (inserts never silently drop keys)
  and raises past STASH_MAX (sizing error, loud)
- seenfilter.load_filter dispatches on blob magic for both families
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import sparkcrawl.cuckoo as cuckoo_mod
from sparkcrawl.bloom import BloomFilter
from sparkcrawl.cuckoo import SLOTS, CuckooFilter, capacity_for_bits
from sparkcrawl.seenfilter import load_filter, new_filter

keys_st = st.lists(
    st.integers(-(2**63), 2**63 - 1), max_size=300, unique=True
)


@settings(max_examples=100, deadline=None)
@given(keys_st)
def test_no_false_negatives(keys):
    cf = CuckooFilter(256)
    cf.add_many(keys)
    if keys:
        assert cf.contains_many(keys).all()


@settings(max_examples=100, deadline=None)
@given(keys_st, st.integers(0, 2**32))
def test_delete_keeps_remaining_keys(keys, salt):
    """Delete an arbitrary inserted subset; every remaining key must still
    probe positive. This is the Fan et al. §3.3 contract: distinct keys that
    collide on (fingerprint, buckets) store distinct copies, so removing one
    key's copy cannot erase another's."""
    cf = CuckooFilter(256)
    cf.add_many(keys)
    drop = [k for i, k in enumerate(keys) if (i + salt) % 3 == 0]
    rest = [k for i, k in enumerate(keys) if (i + salt) % 3 != 0]
    found = cf.delete_many(drop)
    assert found.all()  # every inserted key's copy is findable
    if rest:
        assert cf.contains_many(rest).all()


def test_roundtrip_bytes_with_stash():
    # n_buckets=1 → alt bucket == home bucket, so capacity is exactly SLOTS
    # and every further key lands in the stash
    cf = CuckooFilter(1)
    cf.add_many(list(range(SLOTS + 3)))
    assert cf.stash_fp.size == 3
    assert cf.contains_many(list(range(SLOTS + 3))).all()
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.to_bytes() == cf.to_bytes()
    assert cf2.contains_many(list(range(SLOTS + 3))).all()
    # stash entries delete too
    assert cf2.delete_many(list(range(SLOTS + 3))).all()
    assert not cf2.contains_many(list(range(SLOTS + 3))).any()


def test_stash_overflow_raises(monkeypatch):
    monkeypatch.setattr(cuckoo_mod, "STASH_MAX", 2)
    cf = CuckooFilter(1)
    with pytest.raises(RuntimeError, match="stash overflow"):
        cf.add_many(list(range(SLOTS + 3)))


def test_deterministic_blob_same_order():
    a = CuckooFilter(64)
    b = CuckooFilter(64)
    keys = np.unique(np.arange(-50, 150, dtype=np.int64))
    a.add_many(keys)
    b.add_many(keys)
    assert a.to_bytes() == b.to_bytes()


def test_fpp_bounded():
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(-(2**62), 2**62, 20_000))
    probe = rng.integers(-(2**62), 2**62, 20_000) + 2**62  # disjoint range
    cf = CuckooFilter(1 << 13)  # 32768 slots, ~60% load
    cf.add_many(keys)
    assert cf.contains_many(keys).all()
    # 4 slots × 2 buckets × 16-bit fp → theoretical ~8/2^16 ≈ 1.2e-4
    assert cf.contains_many(probe).mean() < 0.002


def test_capacity_for_bits_matches_bloom_budget():
    # same memory knob as bloom: m_bits of bitarray ≙ m_bits/16 slots
    n = capacity_for_bits(1 << 17)
    assert n == 2048 and n * SLOTS * 16 == 1 << 17
    assert capacity_for_bits(0) == 1  # degenerate budgets stay valid
    assert capacity_for_bits(1 << 10) == 16


def test_load_filter_dispatches_on_magic():
    bf = new_filter("bloom", 1 << 10, 7)
    cf = new_filter("cuckoo", 1 << 10, 7)
    bf.add_many([1, 2, 3])
    cf.add_many([1, 2, 3])
    assert isinstance(load_filter(bf.to_bytes()), BloomFilter)
    assert isinstance(load_filter(cf.to_bytes()), CuckooFilter)
    assert load_filter(cf.to_bytes()).contains_many([1, 2, 3]).all()
    with pytest.raises(ValueError, match="seen_filter_kind"):
        new_filter("xor", 1 << 10, 7)
