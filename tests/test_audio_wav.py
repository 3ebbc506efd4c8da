"""Real WAV-PCM audio path (stdlib wave): round-trips, stereo
down-mix, sine RMS physics, and the stage over real payloads."""

import numpy as np
import pyarrow as pa
import pytest

from hepcrawl_ray.ops.multimodal import (
    AudioFeatureStage,
    decode_audio,
    decode_wav_pcm,
    encode_wav_pcm,
)


# tolerance = one quantization step (encode truncates) + fp32 noise
@pytest.mark.parametrize("width,tol", [(1, 2e-2), (2, 1e-4), (4, 1e-6)])
def test_wav_roundtrip_mono(width, tol):
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, size=4000)
    blob = encode_wav_pcm(x, 16_000, sampwidth=width)
    y, rate = decode_wav_pcm(blob)
    assert rate == 16_000
    assert len(y) == len(x)
    assert np.abs(y - x).max() < tol


def test_wav_stereo_downmix():
    t = np.arange(1000) / 8000.0
    left = 0.5 * np.sin(2 * np.pi * 220 * t)
    interleaved = np.empty(2000)
    interleaved[0::2] = left
    interleaved[1::2] = -left  # cancels on mono average
    blob = encode_wav_pcm(interleaved, 8000, sampwidth=2, channels=2)
    y, rate = decode_wav_pcm(blob)
    assert len(y) == 1000
    assert np.abs(y).max() < 1e-3


def test_sine_rms_is_amp_over_sqrt2():
    rate, amp, freq = 16_000, 0.5, 440.0
    t = np.arange(rate) / rate  # one full second -> whole cycles
    blob = encode_wav_pcm(amp * np.sin(2 * np.pi * freq * t), rate)
    y, _ = decode_wav_pcm(blob)
    rms = np.sqrt((y ** 2).mean())
    assert abs(rms - amp / np.sqrt(2)) < 1e-3


def test_decode_audio_dispatch():
    blob = encode_wav_pcm(np.zeros(100), 8000)
    wav, rate, real = decode_audio(blob)
    assert real and rate == 8000 and len(wav) == 100
    _, rate2, real2 = decode_audio(b"not-a-riff-payload")
    assert not real2 and rate2 == 16_000


def test_stage_over_real_wav(ray_session):
    import ray

    t = np.arange(4000) / 16_000.0
    rows = pa.table({
        "audio_id": ["a0", "a1"],
        "bytes": [encode_wav_pcm(0.5 * np.sin(2 * np.pi * 440 * t), 16_000),
                  b"zzz-not-wav"],
    })
    out = (ray.data.from_arrow(rows)
           .map_batches(AudioFeatureStage, batch_format="pyarrow",
                        concurrency=1)
           .take_all())
    by_id = {r["audio_id"]: r for r in out}
    assert by_id["a0"]["real_decode"] and by_id["a0"]["sample_rate"] == 16_000
    assert by_id["a0"]["n_samples"] == 4000
    # band RMS of a steady sine ~ amp/sqrt(2) in every band
    assert all(abs(e - 0.5 / np.sqrt(2)) < 0.02
               for e in by_id["a0"]["band_energy"])
    assert not by_id["a1"]["real_decode"]


def test_audio_fingerprint_requantization_invariance():
    """8-bit re-encode of a tonal clip drifts the 64-bit Goertzel
    fingerprint 0-4 bits; clips built on different bin subsets stay
    >= 10 apart (the dedup pipeline's margins)."""
    import itertools

    from hepcrawl_ray.ops.multimodal import (audio_fingerprint64,
                                             decode_wav_pcm,
                                             encode_wav_pcm)

    freqs = np.exp(np.linspace(np.log(100.0), np.log(2000.0), 16))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    fps = []
    for i in range(12):
        rate = (8_000, 16_000, 44_100)[i % 3]
        n = rate // 4
        t = np.arange(n, dtype=np.float64) / rate
        rng = np.random.default_rng(1000 + i)
        edges = np.linspace(0, n, 5).astype(np.int64)
        w = np.zeros(n)
        for k in range(4):
            bins = rng.choice(16, size=8, replace=False)
            amps = 0.06 + 0.04 * rng.random(8)
            seg = slice(edges[k], edges[k + 1])
            for b, a in zip(bins, amps):
                w[seg] += a * np.sin(2 * np.pi * freqs[b] * t[seg]
                                     + rng.random() * 6.28)
        x2, r = decode_wav_pcm(encode_wav_pcm(w, rate, sampwidth=2))
        x1, _ = decode_wav_pcm(encode_wav_pcm(w, rate, sampwidth=1))
        f2, f1 = (audio_fingerprint64(x2, r),
                  audio_fingerprint64(x1, r))
        assert ham(f2, f1) <= 4
        fps.append(f2)
    for a, b in itertools.combinations(fps, 2):
        assert ham(a, b) >= 10


def test_audio_dedup_pipeline_collapses_probes(ray_session):
    from hepcrawl_ray.pipelines.queries import (_PROBE_OFFSET,
                                                q_audio_dedup_pipeline)

    out = q_audio_dedup_pipeline("/root/testdata/sf0.001").to_pandas()
    originals = out[out["aud_num"] < _PROBE_OFFSET]
    probes = out[out["aud_num"] >= _PROBE_OFFSET]
    assert len(originals) == 48
    assert len(probes) == 12
    assert out["real_decode"].all() if "real_decode" in out.columns \
        else True
    roots = out.set_index("aud_num")["root"]
    keeps = out.set_index("aud_num")["keep"]
    for pid in probes["aud_num"]:
        orig = pid - _PROBE_OFFSET
        # the re-encoded copy must land in its original's component...
        assert roots[pid] == roots[orig]
        # ...and the WIDER-sample-width original wins the keep
        assert keeps[orig] == 1 and keeps[pid] == 0
    # base clips are pairwise far: every non-probe is its own root
    base_roots = originals["root"]
    assert base_roots.nunique() == 48


def test_audio_quality_gate_flags_planted_failures(ray_session):
    from hepcrawl_ray.pipelines.queries import QUERIES

    out = QUERIES["audio_quality_gate"]("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(out) == 64 and out["decoded"].all()
    for _, r in out.iterrows():
        i = int(r["audio_id"][3:])
        if i % 5 == 0:
            # near-silent plant: almost all samples under threshold
            assert r["silence_milli"] > 900 and not r["is_clean"]
        elif i % 8 == 0:
            # overdriven plant: visible clipping plateau
            assert r["clip_milli"] > 10 and not r["is_clean"]
        else:
            assert r["is_clean"], r.to_dict()


def test_audio_quality_stage_empty_and_garbage_rows():
    import numpy as np
    import pyarrow as pa

    from hepcrawl_ray.ops.multimodal import (AudioQualityStage,
                                             encode_wav_pcm)

    good = encode_wav_pcm(np.zeros(100), 8000, sampwidth=2)
    t = pa.table({"audio_id": pa.array(["zeros", "junk"]),
                  "bytes": pa.array([good, b"xx"], pa.binary())})
    out = AudioQualityStage()(t).to_pandas().set_index("audio_id")
    assert out.loc["zeros", "silence_milli"] == 1000
    assert not out.loc["zeros", "is_clean"]
    assert not out.loc["junk", "decoded"]
