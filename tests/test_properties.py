"""Property-based tests (hypothesis): core invariants under random input."""

import numpy as np
from hypothesis import given, settings, strategies as st

from hepcrawl_ray import urlkit
from hepcrawl_ray.functions import range_as_string
from hepcrawl_ray.state import SeenSet

_host = st.from_regex(r"[a-z][a-z0-9\-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path_seg = st.from_regex(r"[A-Za-z0-9_\-.~]{1,8}", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    if draw(st.booleans()):
        host = host.upper()
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_path_seg, min_size=0, max_size=4))
    path = "/" + "/".join(segs)
    query = draw(st.sampled_from(["", "?b=2&a=1", "?x=&y=1", "?a=1"]))
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


class TestCanonicalizeProperties:
    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, url):
        once = urlkit.canonicalize_url(url)
        assert urlkit.canonicalize_url(once) == once

    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_canonical_form_invariants(self, url):
        c = urlkit.canonicalize_url(url)
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        host = urlkit.host_of(c)
        assert host == host.lower()
        assert "#" not in c
        assert ":80/" not in c.replace("://", "") or scheme != "http"

    @given(urls())
    @settings(max_examples=200, deadline=None)
    def test_hash_matches_vector_path(self, url):
        c = urlkit.canonicalize_url(url)
        assert int(urlkit.hash64_many([c])[0]) == urlkit.url_hash64(c)


class TestSeenSetProperties:
    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 5)),
                    min_size=1, max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_matches_naive_dict_model(self, ops):
        """admit_many over arbitrary (key, ts) sequences == the naive
        sequential dict model of the crawl-once rule, regardless of
        batch splits."""
        ss = SeenSet(capacity=4096)
        model: dict[int, int] = {}
        expected = []
        for k, t in ops:
            prev = model.get(k)
            ok = prev is None or prev < t
            if ok:
                model[k] = t
            expected.append(ok)
        # feed the engine in random batch chunks (sequential order kept)
        got = []
        i = 0
        rng = np.random.default_rng(0)
        while i < len(ops):
            j = min(len(ops), i + int(rng.integers(1, 7)))
            chunk = ops[i:j]
            keys = np.array([k for k, _ in chunk], dtype=np.int64)
            ts = np.array([t for _, t in chunk], dtype=np.int64)
            got.extend(bool(x) for x in ss.admit_many(keys, ts))
            i = j
        assert got == expected


class TestRangeAsStringProperties:
    @given(st.lists(st.integers(1900, 2030), min_size=0, max_size=30,
                    unique=True))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_reconstruction(self, years):
        years = sorted(years)
        s = range_as_string(years)
        # reconstruct the set from the string
        out = []
        if s:
            for part in s.split(", "):
                if "-" in part:
                    lo, hi = part.split("-")
                    out.extend(range(int(lo), int(hi) + 1))
                else:
                    out.append(int(part))
        assert out == years
