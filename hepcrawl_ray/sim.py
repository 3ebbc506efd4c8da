"""Pure-Python reference crawl-scheduler simulator (the ordering oracle).

Defines the *specification* that the distributed frontier
(``hepcrawl_ray.frontier``) must reproduce exactly — the analog of the
reference's single-process Scrapy scheduler semantics (§2.9 of
SURVEY.md): generation-order FIFO within equal priority, politeness
budget per host, crawl-once dedup at request time
(reference: hepcrawl/middlewares.py:134-155; ordering from generator
order + serial paging, reference:
hepcrawl/spiders/common/oaipmh_spider.py:192-227).

Scheduling model (virtual time — deterministic, wall-clock-free):

- Seeds are offered in stream order (``seq``).  Each is
  canonicalized; robots-disallowed paths are dropped; the crawl-once
  rule (skip if seen with stored_ts >= mtime, re-admit if newer)
  decides admission to the per-host pending heap with key
  ``(-priority, seq)`` (higher priority first, FIFO tie-break —
  Scrapy's priority convention).
- Time advances in rounds of ``tick_ms``.  Host ``h`` may start
  fetches in round ``r`` iff ``r >= next_round[h]``; it then pops up
  to ``max_concurrency`` URLs and sets
  ``next_round[h] = r + max(1, ceil(min_delay_ms / tick_ms))``.
- Global admission order within a round: hosts in lexicographic
  order (the deterministic interleave the engine reproduces by
  sorting on ``(round, host, pop_idx)``).

This module is intentionally simple, sequential Python — an
executable spec, not an engine.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field

from hepcrawl_ray import urlkit

DEFAULT_TICK_MS = 100


@dataclass
class SimResult:
    admissions: list  # (round, host, url_canonical, seq, priority, mtime)
    seen_hashes: set
    dropped_robots: int = 0
    dropped_dup: int = 0
    stats: dict = field(default_factory=dict)


def _path_of(canonical_url: str) -> str:
    rest = canonical_url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def _rule_matches(path: str, pattern: str) -> bool:
    """Scalar RFC 9309 pattern match: ``*`` spans any char sequence,
    a trailing ``$`` anchors the path end, everything else literal.
    Implemented as a greedy left-to-right segment scan — deliberately
    NOT the regex translation the engine uses
    (frontier.robots_pattern_to_regex), so the equivalence test
    cross-checks two independent implementations."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    segs = core.split("*")
    if not path.startswith(segs[0]):
        return False
    if len(segs) == 1:
        return path == core if anchored else True
    pos = len(segs[0])
    for seg in segs[1:-1]:
        hit = path.find(seg, pos)
        if hit < 0:
            return False
        pos = hit + len(seg)
    last = segs[-1]
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def robots_blocked(path: str, disallow, allow=()) -> bool:
    """Scalar RFC 9309 verdict (the executable spec of
    frontier.robots_blocked_mask): the matching rule with the LONGEST
    pattern wins, Allow wins length ties, no match -> allowed."""
    best_len, best_allow = -1, 1
    for rules, flag in ((disallow, 0), (allow, 1)):
        for pat in rules:
            if not _rule_matches(path, pat):
                continue
            plen = len(pat)
            if plen > best_len or (plen == best_len and flag > best_allow):
                best_len, best_allow = plen, flag
    return best_allow == 0


def simulate_iterative(seeds_rows: list[dict], politeness_rows: list[dict],
                       discover_fn, tick_ms: int = DEFAULT_TICK_MS,
                       default_concurrency: int = 2,
                       default_delay_ms: int = 0) -> SimResult:
    """Iterative-crawl spec: links discovered from round ``r``'s
    admissions are offered (in admission order) before round ``r+1``.

    ``discover_fn(canonical_url, seq) -> list of seed-like dicts``
    (url, priority, seq, mtime).  The child ``seq`` must be a
    deterministic function of the parent (see crawl.make_tree_discover)
    so engine and simulator agree without any shared counter.
    """
    budget = {
        p["host"]: (int(p["max_concurrency"]), int(p["min_delay_ms"]),
                    tuple(p.get("robots_disallow") or ()),
                    tuple(p.get("robots_allow") or ()))
        for p in politeness_rows
    }
    seen: dict[int, int] = {}
    heaps: dict[str, list] = {}
    dropped_robots = dropped_dup = 0

    def offer(rows):
        nonlocal dropped_robots, dropped_dup
        for row in rows:
            canon = urlkit.canonicalize_url(row["url"])
            host = urlkit.host_of(canon)
            _, _, disallow, allow = budget.get(
                host, (default_concurrency, default_delay_ms, (), ()))
            if robots_blocked(_path_of(canon), disallow, allow):
                dropped_robots += 1
                continue
            h = urlkit.url_hash64(canon)
            mtime = int(row["mtime"])
            prev = seen.get(h)
            if prev is not None and prev >= mtime:
                dropped_dup += 1
                continue
            seen[h] = mtime
            heapq.heappush(
                heaps.setdefault(host, []),
                (-float(row["priority"]), int(row["seq"]), canon, mtime))

    offer(seeds_rows)
    admissions = []
    next_round: dict[str, int] = {}
    rnd = 0
    while any(heaps.values()):
        round_admissions = []
        for host in sorted(heaps):
            heap = heaps[host]
            if not heap or rnd < next_round.get(host, 0):
                continue
            conc, delay = budget.get(
                host, (default_concurrency, default_delay_ms, (), ()))[:2]
            for _ in range(conc):
                if not heap:
                    break
                negp, seq, canon, mtime = heapq.heappop(heap)
                round_admissions.append((rnd, host, canon, seq, -negp, mtime))
            next_round[host] = rnd + max(1, math.ceil(delay / tick_ms))
        admissions.extend(round_admissions)
        for (_, _, canon, seq, _, _) in round_admissions:
            offer(discover_fn(canon, seq))
        rnd += 1

    return SimResult(admissions=admissions, seen_hashes=set(seen),
                     dropped_robots=dropped_robots, dropped_dup=dropped_dup,
                     stats={"rounds": rnd, "admitted": len(admissions)})


def simulate(seeds_rows: list[dict], politeness_rows: list[dict],
             tick_ms: int = DEFAULT_TICK_MS,
             default_concurrency: int = 2,
             default_delay_ms: int = 0) -> SimResult:
    """Run the full crawl schedule over ``seeds_rows`` (stream order).

    ``seeds_rows``: dicts with url, priority, seq, mtime (set_id
    optional).  ``politeness_rows``: dicts with host, max_concurrency,
    min_delay_ms, robots_disallow.
    """
    budget = {
        p["host"]: (int(p["max_concurrency"]), int(p["min_delay_ms"]),
                    tuple(p.get("robots_disallow") or ()),
                    tuple(p.get("robots_allow") or ()))
        for p in politeness_rows
    }

    seen: dict[int, int] = {}      # url_hash -> last admitted mtime
    heaps: dict[str, list] = {}
    dropped_robots = dropped_dup = 0

    for row in seeds_rows:  # offer phase, strictly in stream order
        canon = urlkit.canonicalize_url(row["url"])
        host = urlkit.host_of(canon)
        conc, delay, disallow, allow = budget.get(
            host, (default_concurrency, default_delay_ms, (), ()))
        path = _path_of(canon)
        if robots_blocked(path, disallow, allow):
            dropped_robots += 1
            continue
        h = urlkit.url_hash64(canon)
        mtime = int(row["mtime"])
        prev = seen.get(h)
        if prev is not None and prev >= mtime:
            dropped_dup += 1
            continue
        seen[h] = mtime
        heapq.heappush(
            heaps.setdefault(host, []),
            (-float(row["priority"]), int(row["seq"]), canon, mtime),
        )

    admissions = []
    next_round: dict[str, int] = {h: 0 for h in heaps}
    rnd = 0
    while any(heaps.values()):
        for host in sorted(heaps):
            heap = heaps[host]
            if not heap or rnd < next_round[host]:
                continue
            conc, delay = budget.get(
                host, (default_concurrency, default_delay_ms, (), ()))[:2]
            for _ in range(conc):
                if not heap:
                    break
                negp, seq, canon, mtime = heapq.heappop(heap)
                admissions.append((rnd, host, canon, seq, -negp, mtime))
            next_round[host] = rnd + max(1, math.ceil(delay / tick_ms))
        rnd += 1

    return SimResult(
        admissions=admissions,
        seen_hashes=set(seen),
        dropped_robots=dropped_robots,
        dropped_dup=dropped_dup,
        stats={"rounds": rnd, "admitted": len(admissions)},
    )
