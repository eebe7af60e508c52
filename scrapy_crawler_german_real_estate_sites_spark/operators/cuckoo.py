"""Cuckoo filter — the DELETABLE URL-seen sketch (north_star: "bloom-filter
+ cuckoo-verified URL-seen set").

Role next to the Bloom filter (operators/seen.py): the bloom is the
per-wave hot path (vectorized probes, O(bits) shard merge), but it cannot
forget — once a URL's bits are set they stay set, so a 10^10-URL frontier
whose liveness pass (D9/D10) deletes dead listings accumulates
false-positive pressure from URLs that no longer exist, and the only
remedy is a periodic full rebuild (`CrawlEngine.resume_from` does exactly
that).  A cuckoo filter (Fan et al. 2014, "Cuckoo Filter: Practically
Better than Bloom", CoNEXT) stores displaceable fingerprints instead of
OR-ed bits, which buys:

* **deletion**: a liveness purge removes dead URLs from the sketch
  in-place — no rebuild job over 10^10 rows;
* **lower FP at the same size**: b·2/2^f ≈ 0.012% at b=4 slots × 16-bit
  fingerprints vs ~0.8% for the default bloom config;
* **bounded lookups**: exactly 2 bucket reads per probe.

Design (spec-faithful, vectorized where it matters):

* ``n_buckets`` is a power of two; candidate buckets are
  ``i1 = H(url)`` and ``i2 = i1 XOR H'(fp)`` (partial-key cuckoo
  hashing — the pair is recoverable from (bucket, fp) alone, which is
  what makes distributed shard MERGE possible: shards emit their
  occupied (bucket, fp) entries and the driver re-inserts, never seeing
  a URL string).
* Hashing reuses the engine's vectorized primitives: one
  ``pd.util.hash_array`` pass per batch + a splitmix64 finalizer for the
  fingerprint (no per-row Python on the lookup path).
* Lookups (:meth:`contains_series`) are fully vectorized numpy probes of
  the broadcast table — the same budget as the bloom's probe.
* Inserts walk the standard kick chain (≤ ``max_kicks`` displacements);
  bulk insert is a thin loop over precomputed vectors.  Inserts happen
  at build/merge time (driver or per-partition shard), not per-lookup.

At 10^10 URLs the table is sharded per netloc bucket exactly like the
bloom (each executor holds its bucket's shard); the sandbox default is a
single shard, and :func:`build_cuckoo` keeps the driver merge O(entries)
with 10-byte compact entries, never URL strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from .seen import _hash_pair


def _splitmix16(fp: np.ndarray) -> np.ndarray:
    """64-bit splitmix finalizer over the fingerprint (for the partner-
    bucket hash H'(fp)) — deterministic, vectorized."""
    z = fp.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


class CuckooFilter:
    """Partial-key cuckoo filter: ``(n_buckets, slots)`` uint16 table,
    fingerprint 0 reserved for "empty slot"."""

    def __init__(self, n_buckets: int = 1 << 18, slots: int = 4,
                 max_kicks: int = 500, seed_tag: str = "spark_graft_ckf"):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.slots = slots
        self.max_kicks = max_kicks
        self.seed_tag = seed_tag
        self.table = np.zeros((n_buckets, slots), dtype=np.uint16)
        # victim cache: (bucket, fp) pairs whose kick chain exhausted —
        # without it the LAST displaced fingerprint would silently lose
        # membership (false negatives, i.e. duplicate refetches).  Probed
        # by contains_series / delete_many; carried through serialization.
        self.stash: list[tuple[int, int]] = []
        self._rng = np.random.RandomState(0xC0C0)  # deterministic kicks

    # -- hashing ------------------------------------------------------
    def _fp_i1(self, urls) -> tuple[np.ndarray, np.ndarray]:
        h1, h2 = _hash_pair(np.asarray(urls, dtype=object))
        fp = (h2 & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty-slot sentinel
        i1 = (h1 & np.uint64(self.n_buckets - 1)).astype(np.int64)
        return fp, i1

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (
            i.astype(np.uint64) ^ (
                _splitmix16(fp) & np.uint64(self.n_buckets - 1))
        ).astype(np.int64)

    # -- core ops -----------------------------------------------------
    def _insert_entry(self, i1: int, fp: int) -> bool:
        """Insert one fingerprint given its primary bucket (spec insert:
        try both buckets, then kick).  On kick-chain exhaustion the final
        displaced victim goes to the stash — membership is NEVER silently
        lost; a growing stash (returns False) is the resize signal."""
        i2 = int(self._alt(np.array([i1]), np.array([fp], np.uint16))[0])
        for b in (i1, i2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        b = i1 if self._rng.randint(2) else i2
        cur = np.uint16(fp)
        for _ in range(self.max_kicks):
            s = self._rng.randint(self.slots)
            cur, self.table[b, s] = self.table[b, s], cur
            b = int(self._alt(np.array([b]), np.array([cur]))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        # table effectively full: keep the last victim (which was already
        # evicted from self.table above) in the victim cache
        self.stash.append((b, int(cur)))
        if len(self.stash) == self._STASH_WARN:
            import warnings
            warnings.warn(
                f"CuckooFilter stash reached {len(self.stash)} entries at "
                f"load {self.load:.3f} — resize n_buckets", RuntimeWarning)
        return False

    _STASH_WARN = 64

    def insert_many(self, urls) -> int:
        """Insert a batch; returns how many landed in the TABLE (overflow
        goes to the stash, still queryable — callers size n_buckets for
        <95% load and treat a shortfall as the resize signal)."""
        if not len(urls):
            return 0
        fp, i1 = self._fp_i1(urls)
        return sum(self._insert_entry(int(a), int(f))
                   for a, f in zip(i1, fp))

    def contains_series(self, s: pd.Series) -> pd.Series:
        """Vectorized membership probe: exactly two bucket reads/row
        (+ the victim cache, normally empty)."""
        if not len(s):
            return pd.Series([], dtype=bool)
        fp, i1 = self._fp_i1(s.to_numpy(dtype=object))
        i2 = self._alt(i1, fp)
        hit = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        for sb, sf in self.stash:  # a stash bucket is one of the entry's
            hit |= (fp == sf) & ((i1 == sb) | (i2 == sb))  # two candidates
        return pd.Series(hit)

    def delete_many(self, urls) -> int:
        """Remove one stored fingerprint per present URL (the operation
        the bloom cannot do).  Returns the number actually deleted."""
        if not len(urls):
            return 0
        fp, i1 = self._fp_i1(urls)
        i2 = self._alt(i1, fp)
        deleted = 0
        for f, a, b in zip(fp, i1, i2):
            done = False
            for bucket in (int(a), int(b)):
                slot = np.nonzero(self.table[bucket] == f)[0]
                if len(slot):
                    self.table[bucket, slot[0]] = 0
                    deleted += 1
                    done = True
                    break
            if not done and self.stash:
                for j, (sb, sf) in enumerate(self.stash):
                    if sf == int(f) and sb in (int(a), int(b)):
                        self.stash.pop(j)
                        deleted += 1
                        break
        return deleted

    def delete_entries(self, buckets: np.ndarray, fps: np.ndarray) -> int:
        """Delete by compact (primary-bucket, fp) entries — the
        distributed purge path: partitions hash their dead URLs to
        entries (:func:`cuckoo_shard_rows`), the driver deletes in place.
        Vectorized like :meth:`merge_entries` (one matching slot cleared
        per entry; one winner per bucket per pass so two same-fp dead
        entries clear two distinct copies); stash fallback per entry."""
        b1 = np.asarray(buckets, np.int64)
        f = np.asarray(fps, np.uint16)
        if not len(b1):
            return 0
        b2 = self._alt(b1, f)
        done = np.zeros(len(b1), dtype=bool)
        deleted = 0
        for s in range(self.slots):
            for target in (b1, b2):
                cand = np.nonzero(~done
                                  & (self.table[target, s] == f))[0]
                if not len(cand):
                    continue
                _, first = np.unique(target[cand], return_index=True)
                win = cand[first]
                self.table[target[win], s] = 0
                done[win] = True
                deleted += len(win)
        if self.stash and not done.all():
            for a, b, x in zip(b1[~done], b2[~done], f[~done]):
                for j, (sb, sf) in enumerate(self.stash):
                    if sf == int(x) and sb in (int(a), int(b)):
                        self.stash.pop(j)
                        deleted += 1
                        break
        return deleted

    # -- (de)serialization for broadcast / shard merge ----------------
    def occupied_entries(self) -> tuple[np.ndarray, np.ndarray]:
        """(bucket, fp) of every stored fingerprint, stash included —
        sufficient to re-insert into another table (partial-key
        property)."""
        b, s = np.nonzero(self.table)
        b, f = b.astype(np.int64), self.table[b, s]
        if self.stash:
            b = np.concatenate(
                [b, np.array([e[0] for e in self.stash], np.int64)])
            f = np.concatenate(
                [f, np.array([e[1] for e in self.stash], np.uint16)])
        return b, f

    def merge_entries(self, buckets: np.ndarray, fps: np.ndarray) -> int:
        """Bulk re-insert of compact entries — vectorized greedy passes
        (slot s × {primary, alt} bucket: every still-unplaced entry whose
        target slot is empty claims it, one winner per bucket per pass),
        then the spec kick-chain path for the tiny remainder.  The
        per-entry Python loop this replaces cost ~30 µs/entry — a
        100 TB-scale seen set merges millions of entries per resume."""
        b1 = np.asarray(buckets, np.int64)
        f = np.asarray(fps, np.uint16)
        if not len(b1):
            return 0
        b2 = self._alt(b1, f)
        placed = np.zeros(len(b1), dtype=bool)
        for s in range(self.slots):
            for target in (b1, b2):
                cand = np.nonzero(~placed
                                  & (self.table[target, s] == 0))[0]
                if not len(cand):
                    continue
                _, first = np.unique(target[cand], return_index=True)
                win = cand[first]
                self.table[target[win], s] = f[win]
                placed[win] = True
        n = int(placed.sum())
        n += sum(self._insert_entry(int(a), int(x))
                 for a, x in zip(b1[~placed], f[~placed]))
        return n

    def to_bytes(self) -> bytes:
        """table bytes + trailing stash entries (10 bytes each: int64
        bucket, uint16 fp); table size is fixed by (n_buckets, slots) so
        the split point is recoverable."""
        parts = [self.table.tobytes()]
        for sb, sf in self.stash:
            parts.append(np.int64(sb).tobytes())
            parts.append(np.uint16(sf).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, raw: bytes, n_buckets: int, slots: int = 4):
        cf = cls(n_buckets, slots)
        split = n_buckets * slots * 2
        cf.table = np.frombuffer(raw[:split], dtype=np.uint16).reshape(
            n_buckets, slots).copy()
        pos = split
        while pos < len(raw):
            sb = int(np.frombuffer(raw[pos:pos + 8], dtype=np.int64)[0])
            sf = int(np.frombuffer(raw[pos + 8:pos + 10],
                                   dtype=np.uint16)[0])
            cf.stash.append((sb, sf))
            pos += 10
        return cf

    @property
    def load(self) -> float:
        return float((self.table != 0).sum()) / self.table.size


def cuckoo_shard_rows(urls_df: DataFrame, n_buckets: int, slots: int,
                      out_schema: str, row_fn):
    """Per-partition compact (bucket, fp) entry shards over a url-disjoint
    DataFrame — the cuckoo analogue of ``seen.bloom_shard_rows``: yields
    one row per non-empty partition via ``row_fn(b64_entries: str,
    count: int)`` where the payload is ``count`` int64 buckets followed by
    ``count`` uint16 fingerprints (10 bytes/URL, never URL strings).  The
    driver re-inserts with :meth:`CuckooFilter.merge_entries`."""
    import base64

    probe = CuckooFilter(n_buckets, slots)

    def partial(batches):
        bs, fs = [], []
        for pdf in batches:
            if len(pdf):
                fp, i1 = probe._fp_i1(pdf["url"].tolist())
                bs.append(i1)
                fs.append(fp)
        if bs:
            payload = (np.concatenate(bs).tobytes()
                       + np.concatenate(fs).tobytes())
            cnt = sum(len(a) for a in bs)
            yield pd.DataFrame(
                [row_fn(base64.b64encode(payload).decode("ascii"), cnt)])

    return urls_df.mapInPandas(partial, out_schema)


def decode_entry_payload(raw: bytes, count: int):
    """Inverse of the :func:`cuckoo_shard_rows` payload framing."""
    buckets = np.frombuffer(raw[:8 * count], dtype=np.int64)
    fps = np.frombuffer(raw[8 * count:8 * count + 2 * count],
                        dtype=np.uint16)
    return buckets, fps


def build_cuckoo(seen_urls: DataFrame, col="url",
                 n_buckets: int = 1 << 18, slots: int = 4) -> CuckooFilter:
    """Distributed build: each partition hashes its URLs to compact
    (bucket:int64, fp:uint16) entry arrays (10 bytes/URL — no URL strings
    cross to the driver), and the driver merges by re-insert.  Mirrors
    :func:`..operators.seen.build_bloom`'s shard topology; at 10^10 URLs
    this becomes one shard per netloc bucket."""
    probe = CuckooFilter(n_buckets, slots)

    def partial(batches):
        bs, fs = [], []
        for pdf in batches:
            if len(pdf):
                fp, i1 = probe._fp_i1(pdf[col].tolist())
                bs.append(i1)
                fs.append(fp)
        if bs:
            yield pd.DataFrame({
                "buckets": [np.concatenate(bs).tobytes()],
                "fps": [np.concatenate(fs).tobytes()],
            })

    cf = CuckooFilter(n_buckets, slots)
    for row in seen_urls.select(col).mapInPandas(
            partial, "buckets binary, fps binary").collect():
        cf.merge_entries(
            np.frombuffer(row.buckets, dtype=np.int64),
            np.frombuffer(row.fps, dtype=np.uint16),
        )
    return cf


def with_cuckoo_flag(df: DataFrame, cf: CuckooFilter, url_col="norm_url",
                     flag_col="maybe_seen") -> DataFrame:
    """Boolean membership column over the broadcast table — drop-in for
    :func:`..operators.seen.with_bloom_flag` where the seen set must also
    support deletion."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        (cf.to_bytes(), cf.n_buckets, cf.slots))

    @F.pandas_udf(BooleanType())
    def might_contain(s: pd.Series) -> pd.Series:
        raw, n, k = b.value
        local = CuckooFilter.from_bytes(raw, n, k)
        return local.contains_series(s)

    return df.withColumn(flag_col, might_contain(F.col(url_col)))
