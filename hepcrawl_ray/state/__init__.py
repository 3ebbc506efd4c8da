"""Distributed crawl state: URL-seen filters and checkpoints.

Replaces the reference's crawl-once sqlite DB
(reference: hepcrawl/middlewares.py:58-210) and last-run JSON store
(reference: hepcrawl/spiders/common/lastrunstore_spider.py:53-126) with
per-partition, serializable, numpy-backed structures sized for 10^10
URLs across a partitioned actor pool.
"""

from hepcrawl_ray.state.bloom import BloomFilter
from hepcrawl_ray.state.cuckoo import CuckooMap
from hepcrawl_ray.state.seen import SeenSet

__all__ = ["BloomFilter", "CuckooMap", "SeenSet"]
