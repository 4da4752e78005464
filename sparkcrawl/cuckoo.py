"""Deterministic cuckoo filter over int64 keys — the bloom sidecar's
deletion-capable sibling (BASELINE.json north_star names "a partitioned
bloom/cuckoo-filter URL-seen set"; this is the cuckoo half).

Semantics follow the published design (Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public paper,
reimplemented from its algorithm description): 16-bit fingerprints, 4-slot
buckets, partial-key cuckoo hashing where a fingerprint's alternate bucket is
``i ^ H(fp)`` so relocation never needs the original key. What that buys over
the bloom sidecar (sparkcrawl/bloom.py):

- **Deletion** (`delete_many`): removing one stored fingerprint cannot create
  a false negative for other keys, so seen-set TTL / recrawl maintenance can
  subtract expired keys from the sidecar in place instead of rebuilding every
  bucket blob from the full seen table (a full extra pass over 10^10 keys at
  the design point).
- Same no-false-negative contract: every inserted key probes positive until
  *it* is deleted (property-tested in tests/test_cuckoo.py). False positives
  (~2^-13 at 4 slots/16-bit fp) are killed by the exact seen join exactly as
  bloom false positives are.

Determinism (required because sidecar blobs are committed bytes and resume
must reproduce them bit-for-bit): no RNG anywhere — the victim slot for the
k-th consecutive kick is ``k % SLOTS`` and callers insert sorted key batches
(seenfilter.py sorts), so blob bytes depend only on the insert history, never
on cogroup arrival order. Overflow beyond MAX_KICKS goes to a small stash
(fingerprint + home-bucket pairs, probed vectorized) so inserts never fail
and never silently drop keys; a stash overflowing STASH_MAX raises — that is
a sizing error (blob capacity below key volume), not a runtime condition.

The probe path (`contains_many`) is fully vectorized numpy — it is the
per-round hot path. Inserts/deletes run a per-key loop over numpy-precomputed
fingerprints/indices; they touch only each round's *fresh* keys per bucket
(thousands), not the corpus.

Serialization: 16-byte header (magic ``SCK1``, table-bucket count, stash
length) + uint16 slot table + stash arrays. seenfilter.load_filter dispatches
on the magic, so bloom and cuckoo blobs coexist in one sidecar table.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["CuckooFilter", "capacity_for_bits"]

MAGIC = b"SCK1"
SLOTS = 4
MAX_KICKS = 500
STASH_MAX = 4096
_U64 = np.uint64
_EMPTY = np.uint16(0)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    x = (x + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def capacity_for_bits(m_bits: int) -> int:
    """Table buckets for a memory budget of ``m_bits`` bits — the same knob
    that sizes a bloom blob (config.bloom_bits_per_bucket), so switching
    seen_filter_kind keeps the sidecar's memory footprint: m_bits of bloom
    bitarray ≙ m_bits/16 uint16 slots ≙ m_bits/64 4-slot buckets, rounded
    down to a power of two (the i ^ H(fp) alternate-bucket identity needs a
    power-of-two modulus to stay an involution)."""
    n = max(1, m_bits // (16 * SLOTS))
    return 1 << (n.bit_length() - 1)


class CuckooFilter:
    def __init__(
        self,
        n_buckets: int,
        table: np.ndarray | None = None,
        stash_fp: np.ndarray | None = None,
        stash_idx: np.ndarray | None = None,
    ):
        assert n_buckets > 0 and (n_buckets & (n_buckets - 1)) == 0
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        )
        # stash rows: (fingerprint, home bucket i1) — enough to answer
        # membership (fp matches and the probe's i1 or i2 equals the stored
        # home or its alternate) without keeping original keys
        self.stash_fp = (
            stash_fp if stash_fp is not None else np.zeros(0, dtype=np.uint16)
        )
        self.stash_idx = (
            stash_idx if stash_idx is not None else np.zeros(0, dtype=np.uint32)
        )

    # --- hashing -----------------------------------------------------------
    def _fingerprints(self, keys: np.ndarray) -> np.ndarray:
        """16-bit nonzero fingerprints (0 marks an empty slot)."""
        fp = (_splitmix64(keys.astype(np.int64).view(np.uint64)) & _U64(0xFFFF)).astype(
            np.uint16
        )
        fp[fp == 0] = 1
        return fp

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        u = keys.astype(np.int64).view(np.uint64)
        return (_splitmix64(u ^ _U64(0xC2B2AE3D27D4EB4F)) % _U64(self.n_buckets)).astype(
            np.uint32
        )

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Partial-key alternate bucket: i ^ H(fp). An involution (alt(alt(i))
        == i) because n_buckets is a power of two, so relocation works from
        the fingerprint alone — the property that makes deletion sound."""
        h = _splitmix64(fp.astype(np.uint64)) % _U64(self.n_buckets)
        return (idx.astype(np.uint32) ^ h.astype(np.uint32)) % np.uint32(
            self.n_buckets
        )

    # --- mutation -----------------------------------------------------------
    def add_many(self, keys) -> None:
        """Insert a batch. Two phases: a fully-vectorized fast path places
        every key that fits in its HOME bucket's free slots (the dominant
        case — sidecar backfill into a fresh table is ~2.4M keys per bucket
        task at the 10^10 design point, and per-round fresh keys land in a
        lightly-loaded table); only the remainder (home bucket full) walks
        the per-key alternate-bucket/kick loop. Both phases are
        deterministic (stable sort by home bucket), which committed sidecar
        blobs require."""
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return
        fps = self._fingerprints(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)

        order = np.argsort(i1s, kind="stable")
        g = i1s[order]
        first = np.r_[0, np.flatnonzero(g[1:] != g[:-1]) + 1]
        sizes = np.diff(np.r_[first, g.size])
        rank = np.arange(g.size) - np.repeat(first, sizes)  # intra-bucket rank
        empty = self.table[g] == _EMPTY                     # (n, SLOTS)
        fast = rank < empty.sum(axis=1)                     # fits in home bucket
        if fast.any():
            gf, rf = g[fast], rank[fast]
            # target = the (rank+1)-th empty slot of the home bucket row:
            # ranks are distinct per bucket, so scatter targets never collide
            cs = np.cumsum(empty[fast], axis=1)
            slot = np.argmax((cs == (rf + 1)[:, None]) & empty[fast], axis=1)
            self.table[gf, slot] = fps[order[fast]]
        for j in order[~fast]:
            self._insert_one(int(fps[j]), int(i1s[j]), int(i2s[j]))

    def _insert_one(self, fp: int, i1: int, i2: int) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = fp
                return
        # both buckets full: deterministic kick chain from i1
        idx, cur = i1, np.uint16(fp)
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS
            cur, self.table[idx][slot] = self.table[idx][slot], cur
            idx = int(self._alt_index(np.array([idx]), np.array([cur]))[0])
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = cur
                return
        # stash the final homeless fingerprint with its CURRENT bucket as
        # home (either of its two buckets works for lookup symmetry)
        if self.stash_fp.size >= STASH_MAX:
            raise RuntimeError(
                "cuckoo stash overflow: filter sized below key volume "
                f"(n_buckets={self.n_buckets}, stash={self.stash_fp.size})"
            )
        self.stash_fp = np.append(self.stash_fp, np.uint16(cur))
        self.stash_idx = np.append(self.stash_idx, np.uint32(idx))

    def delete_many(self, keys) -> np.ndarray:
        """Remove ONE stored copy of each key's fingerprint; returns a bool
        array (True = a copy was found and removed). Deleting a key that was
        never inserted may evict another key's colliding fingerprint — the
        cuckoo-filter contract (Fan et al. §3.3) requires callers to delete
        only keys they inserted; the seen-set maintenance path satisfies
        this by construction (it deletes keys read from the seen table)."""
        keys = np.asarray(keys, dtype=np.int64)
        out = np.zeros(keys.size, dtype=bool)
        if keys.size == 0:
            return out
        fps = self._fingerprints(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            out[n] = self._delete_one(np.uint16(fp), int(i1), int(i2))
        return out

    def _delete_one(self, fp: np.uint16, i1: int, i2: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            hit = np.nonzero(row == fp)[0]
            if hit.size:
                row[hit[0]] = _EMPTY
                return True
        if self.stash_fp.size:
            hit = np.nonzero(
                (self.stash_fp == fp)
                & ((self.stash_idx == i1) | (self.stash_idx == i2))
            )[0]
            if hit.size:
                keep = np.ones(self.stash_fp.size, dtype=bool)
                keep[hit[0]] = False
                self.stash_fp = self.stash_fp[keep]
                self.stash_idx = self.stash_idx[keep]
                return True
        return False

    # --- probe (vectorized; the per-round hot path) -------------------------
    def contains_many(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fingerprints(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        hit = (self.table[i1s] == fps[:, None]).any(axis=1) | (
            self.table[i2s] == fps[:, None]
        ).any(axis=1)
        if self.stash_fp.size:
            sf = (fps[:, None] == self.stash_fp[None, :])
            si = (i1s[:, None] == self.stash_idx[None, :]) | (
                i2s[:, None] == self.stash_idx[None, :]
            )
            hit |= (sf & si).any(axis=1)
        return hit

    # --- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        return (
            MAGIC
            + struct.pack("<QI", self.n_buckets, self.stash_fp.size)
            + self.table.tobytes()
            + self.stash_fp.tobytes()
            + self.stash_idx.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        assert blob[:4] == MAGIC, "bad cuckoo blob"
        n_buckets, n_stash = struct.unpack("<QI", blob[4:16])
        off = 16
        tbl_bytes = n_buckets * SLOTS * 2
        table = (
            np.frombuffer(blob[off : off + tbl_bytes], dtype=np.uint16)
            .reshape(n_buckets, SLOTS)
            .copy()
        )
        off += tbl_bytes
        stash_fp = np.frombuffer(blob[off : off + n_stash * 2], dtype=np.uint16).copy()
        off += n_stash * 2
        stash_idx = np.frombuffer(blob[off : off + n_stash * 4], dtype=np.uint32).copy()
        return cls(n_buckets, table, stash_fp, stash_idx)
