"""Reference-format freezes for composite iterators: isa, or-linksto,
prefix and hmap sub-forms, plus the cost-model arithmetic their frozen
statistics embed.

The reference's cursors for expansion-shaped reads carry the frozen
iterator tree *including its statistics*.  Those numbers are not
arbitrary: they derive closed-form from the cost model —

- hmap bins: n from the index, check = find = FUNCTION_CALL +
  bsearch(n, 32k/5, HMAP_ARRAY, HMAP_ELEMENT), next = FUNCTION_CALL +
  HMAP_ELEMENT  (libpdb/pdb-iterator-hmap.c:906-915, bsearch cost
  libpdb/pdb-iterator.c:147-157);
- an or over bins rolls up: n = sum(n_i), next = sum(n_i*nc_i)/n,
  find = sum(fc_i), check = (sum(cc_i)+1)/2
  (graphd/graphd-iterator-or.c:557-585);
- a prefix iterator copies its or's statistics but overrides check to
  COST_PRIMITIVE + 10  (graphd/graphd-iterator-prefix.c:585-592);
- the isa estimates its n by pulling the first 5 distinct targets
  ("average loss"), scaling the subiterator's n by the shared id
  spread, and derives next/check from the sub's costs
  (graphd/graphd-iterator-isa.c isa_statistics_complete).

Everything here is computed from the engine's own DataFrames; nothing
is replayed from the reference.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import functions as F

# libpdb/pdb.h:362-370
COST_GMAP_ELEMENT = 2
COST_GMAP_ARRAY = 10
COST_HMAP_ELEMENT = 1 + COST_GMAP_ELEMENT
COST_HMAP_ARRAY = 1 + COST_GMAP_ARRAY
COST_FUNCTION_CALL = 1
COST_PRIMITIVE = COST_HMAP_ARRAY + 1

#: idarray tile fan-out used in the bsearch cost (pdb-iterator-hmap.c:909)
_N_PER_TILE = 32 * 1024 // 5


def bits(x: int) -> int:
    """Bit length (pdb-iterator.c:30-38)."""
    b = 0
    while x:
        x >>= 1
        b += 1
    return b


def resource_stamp(store, key: str = None, reuse: str = None) -> str:
    """Session stamp for a cached iterator resource
    (graphd-iterator-resource.c:198-205, PID+CLOCK+SEQ —
    0x0123/0x456789AB in predictable mode).  Shared by the Spark
    compiler and the serving fast path so both mint the SAME stamp
    sequence from the store's session counters.

    ``reuse``: a stamp thawed from an incoming cursor — if this
    session allocated it, the underlying resource is still cached
    and re-freezing keeps its stamp (a cache hit mutates the same
    storable in place).  ``key``: content identity for resources
    whose repeated freezes dedup to one stored object (the
    suspension states).  Otherwise every freeze stores a fresh
    object and mints the next stamp."""
    reg = getattr(store, "cursor_resources", None)
    if reg is None:
        reg = store.cursor_resources = {}
        store.cursor_resource_alloc = set()
        store.cursor_resource_next = 1
    if reuse is not None and reuse in store.cursor_resource_alloc:
        return reuse
    if key is not None and key in reg:
        return reg[key]
    stamp = "0123456789ab{}".format(store.cursor_resource_next)
    store.cursor_resource_next += 1
    store.cursor_resource_alloc.add(stamp)
    if key is not None:
        reg[key] = stamp
    return stamp


def masq_resource(store, masq: str, backward: bool,
                  reuse: str = None) -> tuple:
    """(stamp, resource direction) of the cached fixed-set resource
    behind a masqueraded freeze ([cache:@STAMP]).  The resource is
    keyed by the DIRECTION-LESS masquerade identity: a backward chain
    over the same set reuses the forward chain's cached resource
    (probed: forward + backward chains in one session share the same
    stamp, and a resumed freeze prints the CACHED resource's
    direction marker, not the running iterator's)."""
    dirs = getattr(store, "cursor_resource_dirs", None)
    if dirs is None:
        dirs = store.cursor_resource_dirs = {}
    key = "fixedmasq:" + masq
    stamp = resource_stamp(store, key=key, reuse=reuse)
    if key not in dirs:
        dirs[key] = backward
    return stamp, dirs[key]


def bsearch_cost(n: int, n_per_tile: int, array_cost: int,
                 element_cost: int) -> int:
    """pdb_iterator_bsearch_cost (pdb-iterator.c:147-157)."""
    if n == 0:
        return COST_FUNCTION_CALL
    if n_per_tile < n:
        return array_cost * bits(n // n_per_tile) + element_cost * bits(
            n_per_tile
        )
    return array_cost + element_cost * bits(n)


def hmap_costs(n: int) -> tuple[int, int, int]:
    """(check, next, find) of one hmap bin (pdb-iterator-hmap.c:906-915)."""
    check = COST_FUNCTION_CALL + bsearch_cost(
        n, _N_PER_TILE, COST_HMAP_ARRAY, COST_HMAP_ELEMENT
    )
    nxt = COST_FUNCTION_CALL + COST_HMAP_ELEMENT
    return check, nxt, check


def ci_hash(key: str) -> int:
    """The hmap key hash: case-folded h*33+c, 34 bits
    (pdb-hash.c pdb_case_insensitive_hash)."""
    h = 0
    for c in key:
        o = ord(c)
        if o < 128:
            c = c.lower()
        h = h * 33 + ord(c)
    return h & ((1 << 34) - 1)


class PrefixStats:
    """Frozen-statistics view of a value-word prefix iterator."""

    __slots__ = ("prefix", "low", "high", "n", "next_cost", "find_cost",
                 "check_cost")

    def __init__(self, prefix, low, high, n, next_cost, find_cost):
        self.prefix = prefix
        self.low = low
        self.high = high
        self.n = n
        self.next_cost = next_cost
        self.find_cost = find_cost
        # prefix check is a primitive read + glob, cheaper than its or
        # (graphd-iterator-prefix.c:590)
        self.check_cost = COST_PRIMITIVE + 10

    def set_str(self) -> str:
        return f"prefix:{self.low}-{self.high}:{self.prefix}"

    def st_str(self) -> str:
        return f"[st:{self.n}:{self.next_cost}:{self.find_cost}]"


def prefix_stats(spark, store, prefix: str) -> Optional[PrefixStats]:
    """Build the prefix iterator's statistics from the word index.

    The prefix's or has one hmap bin per distinct indexed word with
    that prefix; n / next / find roll up per the or formulas.  The
    word index is the tokenized value column (libpdb/pdb-word.c)."""
    from pyspark.sql.types import ArrayType, LongType

    from graphd_spark.model import su_decode
    from graphd_spark.wordhash import prefix_mask, value_word_codes, word_hash

    mask = prefix_mask(prefix)
    want = word_hash(prefix) & mask

    @F.pandas_udf(ArrayType(LongType()))
    def _codes(vals: pd.Series) -> pd.Series:
        return vals.map(
            lambda v: []
            if v is None
            else [
                c
                for c in value_word_codes(su_decode(v))
                if (c & mask) == want
            ]
        )

    df = store.to_df(spark)
    # one or-member per EXISTING HASH BIN, not per distinct word:
    # colliding words (wordhash.py) share a bin and its id list
    words = (
        df.select("id", F.explode(_codes(F.col("value"))).alias("w"))
        .distinct()
    )
    rows = (
        words.groupBy("w")
        .agg(F.count("*").alias("n"), F.min("id").alias("lo"))
        .limit(10001)
        .collect()
    )
    if not rows or len(rows) > 10000:
        return None
    total_n = 0
    total_nc = 0
    total_fc = 0
    low = None
    for r in rows:
        n_i = int(r["n"])
        cc, nc, fc = hmap_costs(n_i)
        total_n += n_i
        total_nc += n_i * nc
        total_fc += fc
        low = r["lo"] if low is None else min(low, r["lo"])
    if total_n == 0:
        return None
    return PrefixStats(
        prefix=prefix.lower(),
        low=int(low),
        high=store.count(),
        n=total_n,
        next_cost=total_nc // total_n,
        find_cost=total_fc,
    )


class IsaStats:
    """The isa iterator's own frozen statistics (n from the 5-sample
    loss estimate, isa_statistics_complete)."""

    __slots__ = ("low", "high", "n", "next_cost", "check_cost")

    def __init__(self, low, high, n, next_cost, check_cost):
        self.low = low
        self.high = high
        self.n = n
        self.next_cost = next_cost
        self.check_cost = check_cost

    def stats_str(self) -> str:
        # find cost 0 => check:next:n form (pdb_iterator_freeze_statistics)
        return f"{self.check_cost}:{self.next_cost}:{self.n}"


def isa_stats(
    store_n: int,
    sub_n: int,
    sub_next_cost: int,
    sub_check_cost: int,
    sub_low: int,
    sub_high: int,
    trial_n: int,
    sample_n: int,
) -> IsaStats:
    """isa_statistics_complete (graphd-iterator-isa.c): scale the
    subiterator's n by the shared id spread, divide by the sampled
    average loss, derive next from the cost of draining the sub."""
    isa_low = 0
    isa_high = store_n - 1  # highest possible target id
    upper_bound = isa_high - isa_low  # spread
    if sample_n == 0:
        average_loss = 2.0 * trial_n
    else:
        average_loss = trial_n / sample_n
    if average_loss > upper_bound:
        average_loss = float(upper_bound)
    max_low = max(sub_low, isa_low)
    sub_spread = sub_high - max_low if sub_high > max_low else 1
    if sub_low >= isa_high:
        cooked_sub_n = sub_n
    else:
        isa_spread = isa_high - max_low if isa_high > max_low else 1
        shared = min(sub_spread, isa_spread)
        cooked_sub_n = (min(sub_n, sub_spread) * shared) // sub_spread
        if cooked_sub_n > shared:
            cooked_sub_n = shared
    isa_n = (
        int(cooked_sub_n / average_loss)
        if cooked_sub_n >= average_loss
        else 1
    )
    if isa_n < 5:  # GRAPHD_ISA_N_SAMPLES
        isa_n = 5
    next_cost = (
        min(sub_n, sub_spread) * (sub_next_cost + COST_PRIMITIVE)
    ) // isa_n + isa_n // 8000
    check_cost = COST_GMAP_ARRAY + COST_GMAP_ELEMENT + sub_check_cost
    return IsaStats(isa_low, isa_high, isa_n, next_cost, check_cost)


def hmap_set_str(type_name: str, key: str, low: int, high: int) -> str:
    """hmap SET freeze: hmap:LOW-HIGH:map:type:hash:key
    (pdb-iterator-hmap.c:148-173); the single hmap file is 'pool' and
    the key is %XX-escaped (pdb_xx_encode)."""
    # pdb_xx_encode (libpdb/pdb-util.c:51-68): byte-wise over the
    # UTF-8 form; ONLY ASCII alphanumerics pass through, every other
    # byte becomes %xx (lowercase) — '-' and '_' included
    enc = "".join(
        chr(b) if b < 0x80 and chr(b).isalnum() else "%{:02x}".format(b)
        for b in key.encode("utf-8", "surrogateescape")
    )
    return "hmap:{}-{}:pool:{}:{}:{}".format(
        low, high, type_name, ci_hash(key), enc
    )
