"""Property-based tests for the round-2 surfaces: WAV codec, ORCID
normalization, sliding-window math, SimHash banding, shingles."""

import numpy as np
from hypothesis import given, settings, strategies as st

from hepcrawl_ray.jats import normalize_orcid, split_page_artid
from hepcrawl_ray.ops import text as T
from hepcrawl_ray.ops.multimodal import decode_wav_pcm, encode_wav_pcm


class TestWavProperties:
    @given(st.integers(0, 2**32 - 1), st.sampled_from([1, 2, 4]),
           st.sampled_from([8000, 16000, 44100]), st.integers(1, 500))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_within_quantization(self, seed, width, rate, n):
        rng = np.random.default_rng(seed)
        x = rng.uniform(-0.95, 0.95, size=n)
        y, r = decode_wav_pcm(encode_wav_pcm(x, rate, sampwidth=width))
        assert r == rate and len(y) == n
        # encode truncates (up to 1 step) and PCM encode/decode scales
        # are asymmetric (xN vs /(N+1)): bound is 2 quantization steps
        step = {1: 1 / 127.0, 2: 1 / 32767.0, 4: 1e-6}[width]
        assert np.abs(y - x).max() <= 2 * step + 1e-6

    @given(st.integers(0, 2**32 - 1), st.integers(1, 4))
    @settings(max_examples=30, deadline=None)
    def test_multichannel_downmix_is_mean(self, seed, channels):
        rng = np.random.default_rng(seed)
        frames = rng.uniform(-0.9, 0.9, size=(50, channels))
        blob = encode_wav_pcm(frames.reshape(-1), 8000, sampwidth=2,
                              channels=channels)
        y, _ = decode_wav_pcm(blob)
        assert len(y) == 50
        assert np.abs(y - frames.mean(axis=1)).max() < 1e-3


class TestOrcidProperties:
    _core = st.from_regex(r"[0-9]{15}[0-9X]", fullmatch=True)

    @given(_core)
    @settings(max_examples=100, deadline=None)
    def test_idempotent_and_prefix_invariant(self, core):
        dashed = "-".join([core[0:4], core[4:8], core[8:12], core[12:16]])
        want = dashed.upper()
        assert normalize_orcid(dashed) == want
        assert normalize_orcid(core) == want
        assert normalize_orcid(f"https://orcid.org/{dashed}") == want
        assert normalize_orcid(f"orcid: {dashed.lower()}") == want
        # idempotent: normalizing a normalized id is a no-op
        assert normalize_orcid(want) == want


class TestPageArtidProperties:
    @given(st.integers(1, 10_000), st.integers(0, 500))
    @settings(max_examples=60, deadline=None)
    def test_numeric_ranges_split(self, a, span):
        fp, lp, artid = split_page_artid(f"{a}-{a + span}")
        assert (fp, lp, artid) == (str(a), str(a + span), None)

    @given(st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,6}", fullmatch=True))
    @settings(max_examples=40, deadline=None)
    def test_non_numeric_is_artid(self, tok):
        assert split_page_artid(tok) == (None, None, tok)


class TestSlidingWindowProperty:
    @given(st.integers(0, 2**32 - 1), st.integers(1, 80))
    @settings(max_examples=25, deadline=None)
    def test_window_edges_match_bruteforce(self, seed, n):
        """The searchsorted/cumsum edges equal the O(n^2) definition:
        rows of the same user with |ts_j - ts_i| within the window."""
        rng = np.random.default_rng(seed)
        win = 100
        uid = rng.integers(0, 4, size=n)
        ts = rng.integers(0, 400, size=n)
        val = rng.integers(-50, 50, size=n)
        order = np.lexsort((ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]

        # production shape (mirrors q_window_sliding_events.windows)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(new_user)[0]
        ends = np.append(starts[1:], n)
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - win, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        csum = np.concatenate(([0], np.cumsum(val)))
        got_n = hi - lo
        got_sum = csum[hi] - csum[lo]

        # brute force with SQL RANGE semantics (inclusive low, peers)
        for i in range(n):
            mask = (uid == uid[i]) & (ts >= ts[i] - win) & (ts <= ts[i])
            assert got_n[i] == mask.sum()
            assert got_sum[i] == val[mask].sum()


class TestSimhashBandingProperty:
    @given(st.integers(0, 2**32 - 1), st.integers(0, 6))
    @settings(max_examples=60, deadline=None)
    def test_pigeonhole_guarantees_band_collision(self, seed, d):
        """Any two signatures within Hamming distance d agree on at
        least one of the d+1 disjoint bit bands."""
        rng = np.random.default_rng(seed)
        a_u = np.uint64(int.from_bytes(rng.bytes(8), "little"))
        flip = rng.choice(64, size=d, replace=False)
        b_u = a_u
        for bit in flip:
            b_u = b_u ^ (np.uint64(1) << np.uint64(int(bit)))
        n_bands = d + 1
        base, extra = divmod(64, n_bands)
        widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
        offsets = np.cumsum([0] + widths[:-1])
        collides = any(
            (a_u >> np.uint64(offsets[i])) & np.uint64((1 << widths[i]) - 1)
            == (b_u >> np.uint64(offsets[i])) & np.uint64((1 << widths[i]) - 1)
            for i in range(n_bands))
        assert collides


class TestShingleProperties:
    _words = st.lists(st.from_regex(r"[a-z]{1,6}", fullmatch=True),
                      min_size=0, max_size=20)

    @given(_words, st.integers(2, 4))
    @settings(max_examples=100, deadline=None)
    def test_count_and_threshold(self, words, k):
        text = " ".join(words)
        sh = T.shingles(text, k)
        if len(words) < k:
            assert sh == []
        else:
            assert len(sh) == len(words) - k + 1
            assert all(len(s.split(" ")) == k for s in sh)

    @given(_words, st.integers(2, 4))
    @settings(max_examples=60, deadline=None)
    def test_jaccard_self_similarity(self, words, k):
        text = " ".join(words)
        j = T.jaccard_tokens(text, text, k)
        assert j == (1.0 if len(words) >= k else 0.0)
