"""Multimodal column operators: decode / resize / feature-extract /
frame-sample over opaque ``binary`` payload columns with typed metadata.

The Ray-side plumbing (schemas, actor-pool stages, batch sizing, output
layout) is real and tested for every modality.  The image path is fully
real (our own codecs).  Audio/video decoding libraries are NOT
available in this container, so those decode kernels are explicit,
clearly-marked deterministic STUBS behind the same stage interface —
swap ``_decode_audio_stub`` / ``_decode_video_stub`` for a real codec
and nothing else changes.

Batch-size guidance: payload columns dominate block size; pass small
``batch_size`` (<=256 for MB-scale payloads) and rely on Ray's dynamic
block splitting (see DataContext.target_max_block_size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hepcrawl_ray import codecs


class ImageDecodeStage:
    """binary -> decoded metadata + features (REAL decode via codecs)."""

    def __init__(self, compute_histogram: bool = True, resize_to: int | None = None):
        self.compute_histogram = compute_histogram
        self.resize_to = resize_to

    @staticmethod
    def _resize(px: np.ndarray, side: int) -> np.ndarray:
        """Nearest-neighbor resize to (side, side) — deterministic."""
        h, w = px.shape[:2]
        yi = (np.arange(side) * h // side)
        xi = (np.arange(side) * w // side)
        return px[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ok, w_out, h_out, mean_lum, hist, thumb = [], [], [], [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = codecs.decode(blob, fmt)
            except Exception:
                ok.append(False)
                w_out.append(0)
                h_out.append(0)
                mean_lum.append(0.0)
                hist.append([0] * 8)
                thumb.append(None)
                continue
            ok.append(True)
            h_out.append(px.shape[0])
            w_out.append(px.shape[1])
            gray = px.mean(axis=2)
            mean_lum.append(float(gray.mean()))
            if self.compute_histogram:
                hist.append(np.bincount((gray // 32).astype(np.int64).ravel(),
                                        minlength=8)[:8].tolist())
            else:
                hist.append([0] * 8)
            if self.resize_to:
                thumb.append(codecs.encode_png(
                    self._resize(px, self.resize_to)))
            else:
                thumb.append(None)
        out = pa.table({
            "image_id": batch.column("image_id"),
            "decoded": pa.array(ok),
            "w_decoded": pa.array(w_out, pa.int32()),
            "h_decoded": pa.array(h_out, pa.int32()),
            "mean_luma": pa.array(mean_lum, pa.float64()),
            "luma_hist": pa.array(hist, pa.list_(pa.int64())),
            "thumbnail": pa.array(thumb, pa.binary()),
        })
        return out


def decode_wav_pcm(blob: bytes) -> tuple[np.ndarray, int]:
    """REAL PCM WAV decode via stdlib ``wave`` — no external codecs.

    Supports 8-bit unsigned and 16/32-bit signed little-endian PCM,
    any channel count (averaged to mono).  Returns (float32 waveform
    in [-1, 1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_wav_pcm(waveform: np.ndarray, rate: int, *,
                   sampwidth: int = 2, channels: int = 1) -> bytes:
    """Float waveform in [-1, 1] -> PCM WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    x = np.clip(np.asarray(waveform, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 1:
        data = (x * 127.0 + 128.0).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        data = (x * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 4:
        data = (x * 2147483647.0).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported PCM sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(data)
    return buf.getvalue()


def _decode_audio_stub(blob: bytes, sample_rate: int = 16_000) -> np.ndarray:
    """STUB for NON-WAV formats — no mp3/ogg/flac codec in this
    container (WAV-PCM is decoded for real by ``decode_wav_pcm``).

    Deterministic fake: interprets the payload's blake2b digest as a
    seed and synthesizes ``sample_rate`` samples.  Replace with a real
    decoder (e.g. soundfile/ffmpeg) to process real compressed audio;
    the stage contract (bytes in, float32 waveform out) is unchanged.
    """
    from hashlib import blake2b

    seed = int.from_bytes(blake2b(blob, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(sample_rate, dtype=np.float32)


def decode_audio(blob: bytes) -> tuple[np.ndarray, int, bool]:
    """(waveform, sample_rate, real_decode): WAV payloads (RIFF magic)
    decode for real; anything else falls through to the marked stub."""
    if blob[:4] == b"RIFF":
        wav, rate = decode_wav_pcm(blob)
        return wav, rate, True
    return _decode_audio_stub(blob), 16_000, False


def audio_fingerprint64(wav: np.ndarray, rate: int, *,
                        n_bins: int = 16, n_windows: int = 4,
                        fmin: float = 100.0,
                        fmax: float = 2_000.0) -> int:
    """REAL chromaprint-shaped 64-bit audio fingerprint (no codec
    libs needed — operates on the decoded waveform).

    The clip splits into ``n_windows`` equal TIME windows; each window
    projects onto ``n_bins`` log-spaced sinusoid pairs (a Goertzel
    bank: energy = (x.cos)^2 + (x.sin)^2 at absolute time, so the
    value is sample-rate independent) and emits one bit per bin:
    ``energy > window median``.  Median thresholding makes the bits
    amplitude-invariant and exactly half-set per window, and tonal
    content far from the median survives PCM re-quantization — an
    8-bit re-encode typically drifts 0-4 of the 64 bits (pinned in
    tests/test_audio_wav.py).
    """
    assert n_bins * n_windows == 64, "fingerprint is 64-bit"
    n = len(wav)
    if n == 0:
        return 0
    freqs = np.exp(np.linspace(np.log(fmin), np.log(fmax), n_bins))
    bits = 0
    edges = np.linspace(0, n, n_windows + 1).astype(np.int64)
    for w in range(n_windows):
        x = wav[edges[w]:edges[w + 1]].astype(np.float64)
        if len(x) == 0:
            continue
        t = np.arange(edges[w], edges[w + 1], dtype=np.float64) / rate
        ph = 2.0 * np.pi * freqs[:, None] * t[None, :]
        e = (np.cos(ph) @ x) ** 2 + (np.sin(ph) @ x) ** 2
        med = np.median(e)
        for b in range(n_bins):
            if e[b] > med:
                bits |= 1 << (w * n_bins + b)
    return bits


def audio_fingerprints(blobs) -> tuple[np.ndarray, np.ndarray,
                                       np.ndarray]:
    """Batched decode + fingerprint: (fp int64, sample_rate int32,
    real_decode bool) per payload."""
    fps, rates, real = [], [], []
    for blob in blobs:
        wav, rate, is_real = decode_audio(blob)
        fp = audio_fingerprint64(wav, rate)
        fps.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
        rates.append(rate)
        real.append(is_real)
    return (np.asarray(fps, np.int64), np.asarray(rates, np.int32),
            np.asarray(real, bool))


def _decode_video_stub(blob: bytes, n_frames: int = 16,
                       size: int = 32) -> np.ndarray:
    """STUB — no video codec in this container (see _decode_audio_stub)."""
    from hashlib import blake2b

    seed = int.from_bytes(blake2b(blob, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n_frames, size, size, 3), dtype=np.uint8)


class AudioFeatureStage:
    """binary audio -> fixed-length band-energy features.

    WAV-PCM payloads decode for REAL (stdlib wave); other formats hit
    the marked stub.  Emits sample metadata so downstream filters can
    select on real-decode provenance."""

    def __init__(self, n_bands: int = 16):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, rates, nsamp, real = [], [], [], []
        for blob in batch.column("bytes").to_pylist():
            wav, rate, is_real = decode_audio(blob)
            bands = np.array_split(wav, self.n_bands)
            feats.append([float(np.sqrt((b ** 2).mean())) for b in bands])
            rates.append(rate)
            nsamp.append(len(wav))
            real.append(is_real)
        return pa.table({
            "audio_id": batch.column("audio_id"),
            "band_energy": pa.array(feats, pa.list_(pa.float64())),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "real_decode": pa.array(real, pa.bool_()),
        })


class AudioQualityStage:
    """Audio ingest QC: silence ratio, clipping ratio, peak and RMS
    per clip — the gate that drops dead-air and clipped recordings
    before feature extraction spends compute on them.  REAL WAV-PCM
    decode (stdlib); all ratios emitted as deterministic milli ints
    (floor), thresholds fixed at construction (once per actor)."""

    def __init__(self, silence_amp_milli: int = 10,
                 max_silence_milli: int = 900,
                 max_clip_milli: int = 10):
        self.silence_amp = silence_amp_milli / 1000.0
        self.max_silence_milli = int(max_silence_milli)
        self.max_clip_milli = int(max_clip_milli)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        n = len(blobs)
        ok = np.zeros(n, bool)
        sil = np.full(n, -1, np.int64)
        clip = np.full(n, -1, np.int64)
        peak = np.full(n, -1, np.int64)
        rms = np.full(n, -1, np.int64)
        for i, blob in enumerate(blobs):
            try:
                wav, _rate = decode_wav_pcm(blob)
            except Exception:
                continue
            ok[i] = True
            if not len(wav):
                continue
            a = np.abs(wav)
            sil[i] = int(1000 * int((a < self.silence_amp).sum())
                         // len(a))
            clip[i] = int(1000 * int((a >= 0.999).sum()) // len(a))
            peak[i] = int(np.floor(1000 * float(a.max())))
            rms[i] = int(np.floor(
                1000 * float(np.sqrt(np.mean(wav * wav)))))
        clean = ok & (sil >= 0) & (sil <= self.max_silence_milli) \
            & (clip <= self.max_clip_milli)
        return pa.table({
            "audio_id": batch.column("audio_id"),
            "decoded": pa.array(ok),
            "silence_milli": pa.array(sil),
            "clip_milli": pa.array(clip),
            "peak_milli": pa.array(peak),
            "rms_milli": pa.array(rms),
            "is_clean": pa.array(clean),
        })


class VideoFrameSampleStage:
    """binary video -> k uniformly sampled frame thumbnails (stubbed decode)."""

    def __init__(self, k_frames: int = 4):
        self.k = k_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, frames = [], [], []
        for vid, blob in zip(batch.column("video_id").to_pylist(),
                             batch.column("bytes").to_pylist()):
            clip = _decode_video_stub(blob)
            pick = np.linspace(0, len(clip) - 1, self.k).astype(int)
            for j, fi in enumerate(pick):
                vids.append(vid)
                idxs.append(int(fi))
                frames.append(codecs.encode_png(clip[fi]))
        return pa.table({
            "video_id": pa.array(vids),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_png": pa.array(frames, pa.binary()),
        })


# ------------------------------------------------------------ resize ----

def area_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Anti-aliased area-average downsample via a 2-D integral image —
    the box over each output cell is averaged exactly, fully
    vectorized (two cumsums + one gather per channel; no Python over
    pixels).  Matches the 'area' interpolation of the mainstream image
    libs for integer grids.  Upsampling falls back to nearest (area
    semantics need h >= out_h)."""
    h, w = px.shape[:2]
    if out_h > h or out_w > w:
        yi = np.arange(out_h) * h // out_h
        xi = np.arange(out_w) * w // out_w
        return px[yi][:, xi]
    squeeze = px.ndim == 2
    a = px[:, :, None].astype(np.float64) if squeeze \
        else px.astype(np.float64)
    integ = np.zeros((h + 1, w + 1, a.shape[2]), dtype=np.float64)
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=integ[1:, 1:])
    y = (np.arange(out_h + 1) * h) // out_h
    x = (np.arange(out_w + 1) * w) // out_w
    y0, y1 = y[:-1], y[1:]
    x0, x1 = x[:-1], x[1:]
    box = (integ[np.ix_(y1, x1)] - integ[np.ix_(y0, x1)]
           - integ[np.ix_(y1, x0)] + integ[np.ix_(y0, x0)])
    areas = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    out = box / areas[:, :, None]
    out = np.floor(out + 0.5).astype(px.dtype)
    return out[:, :, 0] if squeeze else out


class ImagePatchStage:
    """ViT-style patchification stats: decode to LUMA once (no RGB
    materialization), split into non-overlapping P×P patches (edge
    remainders cropped — the ViT convention), and emit per-image
    INTEGER patch-quality stats: grid shape, patch count, blank-patch
    count (variance below a milli threshold — the border / solid-fill
    filter signal vision pipelines gate on), and mean patch variance.

    All patch moments come from ONE (gh, p, gw, p) reshape + two
    axis-sums per image — no per-patch Python.  Luma values are exact
    integers (codecs._luma_from_rgb_bytes), so variance is computed in
    int64 as n·Σx² − (Σx)² and scaled by 1000·/n² with integer
    division — bit-deterministic across runs and partitionings.
    Decode is the real per-image work (CLAUDE lesson 8: batch the
    fixed-overhead tail, keep the big per-image ops per-image)."""

    def __init__(self, patch: int = 8, blank_var_milli: int = 1000):
        self.patch = int(patch)
        self.blank_var_milli = int(blank_var_milli)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.patch
        n_px = p * p
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = len(blobs)
        ok = np.zeros(n, bool)
        grid_h = np.zeros(n, np.int64)
        grid_w = np.zeros(n, np.int64)
        n_blank = np.zeros(n, np.int64)
        mean_var = np.zeros(n, np.int64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                luma, w, h = codecs.decode_luma(blob, fmt)
            except Exception:
                continue
            gh, gw = h // p, w // p
            if gh == 0 or gw == 0:
                ok[i] = True          # decoded, just smaller than one patch
                continue
            ok[i] = True
            grid_h[i], grid_w[i] = gh, gw
            v = luma[:gh * p, :gw * p].astype(np.int64)
            blocks = v.reshape(gh, p, gw, p)
            s = blocks.sum(axis=(1, 3))
            ss = (blocks * blocks).sum(axis=(1, 3))
            var_num = n_px * ss - s * s            # n² × variance
            var_milli = 1000 * var_num // (n_px * n_px)
            n_blank[i] = int((var_milli < self.blank_var_milli).sum())
            mean_var[i] = int(1000 * int(var_num.sum())
                              // (n_px * n_px * gh * gw))
        return pa.table({
            "image_id": batch.column("image_id"),
            "decoded": pa.array(ok),
            "grid_h": pa.array(grid_h),
            "grid_w": pa.array(grid_w),
            "n_patches": pa.array(grid_h * grid_w),
            "n_blank": pa.array(n_blank),
            "mean_patch_var_milli": pa.array(mean_var),
        })


class ImageSharpnessStage:
    """Blur detection by Laplacian variance — the classic sharpness
    gate vision-corpus QC runs before spending GPU time on a frame.

    Decodes to LUMA (integer-exact values), applies the 4-neighbor
    Laplacian (4x − up − down − left − right) over the interior as
    four SHIFTED ARRAY VIEWS (no per-pixel Python, no conv library),
    and scores variance in int64 via n·Σx² − (Σx)² with milli integer
    division — bit-deterministic.  Images too small for an interior
    (h or w < 3) are decoded-but-unscored (sharpness −1, not sharp)."""

    def __init__(self, min_sharpness_milli: int = 2_000):
        self.min_sharpness_milli = int(min_sharpness_milli)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = len(blobs)
        ok = np.zeros(n, bool)
        sharp_milli = np.full(n, -1, np.int64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                luma, w, h = codecs.decode_luma(blob, fmt)
            except Exception:
                continue
            ok[i] = True
            if h < 3 or w < 3:
                continue
            v = luma.astype(np.int64)
            lap = (4 * v[1:-1, 1:-1] - v[:-2, 1:-1] - v[2:, 1:-1]
                   - v[1:-1, :-2] - v[1:-1, 2:])
            m = lap.size
            s = int(lap.sum())
            ss = int((lap * lap).sum())
            sharp_milli[i] = 1000 * (m * ss - s * s) // (m * m)
        return pa.table({
            "image_id": batch.column("image_id"),
            "decoded": pa.array(ok),
            "sharpness_milli": pa.array(sharp_milli),
            "is_sharp": pa.array(
                sharp_milli >= self.min_sharpness_milli),
        })


class ImageQualityStage:
    """LAION-style image corpus gate: decode (REAL, own codecs) and
    judge size / aspect / contrast / entropy against thresholds.  All
    stats are emitted as integer milli-units so the pass flag is
    deterministic; setup (thresholds, entropy log table) happens once
    per actor."""

    def __init__(self, min_side: int = 16, max_aspect_milli: int = 3000,
                 min_contrast_milli: int = 20,
                 min_entropy_milli: int = 500):
        self.min_side = min_side
        self.max_aspect_milli = max_aspect_milli
        self.min_contrast_milli = min_contrast_milli
        self.min_entropy_milli = min_entropy_milli

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = len(blobs)
        wv = np.zeros(n, np.int64)
        hv = np.zeros(n, np.int64)
        aspect = np.zeros(n, np.int64)
        contrast = np.zeros(n, np.int64)
        entropy = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                gray, hh, ww = codecs.decode_luma(blob, fmt)
            except Exception:
                continue
            ok[i] = True
            hv[i], wv[i] = hh, ww
            aspect[i] = (max(hh, ww) * 1000) // max(min(hh, ww), 1)
            g = gray.astype(np.float64)
            contrast[i] = int(g.std() * 1000.0 / 255.0)
            counts = np.bincount(gray.ravel().astype(np.int64),
                                 minlength=256)
            p = counts[counts > 0] / gray.size
            entropy[i] = int(-(p * np.log2(p)).sum() * 1000.0 / 8.0)
        passed = (ok & (np.minimum(wv, hv) >= self.min_side)
                  & (aspect <= self.max_aspect_milli)
                  & (contrast >= self.min_contrast_milli)
                  & (entropy >= self.min_entropy_milli))
        return pa.table({
            "image_id": batch.column("image_id"),
            "decoded": pa.array(ok),
            "w": pa.array(wv), "h": pa.array(hv),
            "aspect_milli": pa.array(aspect),
            "contrast_milli": pa.array(contrast),
            "entropy_milli": pa.array(entropy),
            "passed": pa.array(passed.astype(np.int64))})


class CaptionAlignStage:
    """Image-caption alignment scoring — the CLIP-score gating shape.

    The Ray plumbing is the real pattern for batched model inference:
    the 'model' (two fixed random-projection matrices) is built ONCE
    per actor in __init__, every batch is scored with two matmuls and
    a vectorized cosine.  The projections are a clearly-marked
    DETERMINISTIC STAND-IN for a real dual encoder (no ML libs in this
    container); swap ``_embed_text``/``_embed_image`` for real encoders
    and nothing else changes.
    """

    DIM = 32

    def __init__(self, seed: int = 73):
        rng = np.random.default_rng(seed)
        self.text_proj = rng.normal(size=(256, self.DIM))
        self.img_proj = rng.normal(size=(256, self.DIM))

    def _embed_text(self, captions) -> np.ndarray:
        out = np.zeros((len(captions), 256), dtype=np.float64)
        for i, c in enumerate(captions):
            toks = c.lower().split()
            if toks:
                idx = np.frombuffer(
                    b"".join(__import__("hashlib")
                             .blake2b(t.encode(), digest_size=2).digest()
                             for t in toks), dtype="<u2") % 256
                np.add.at(out[i], idx, 1.0)
        return out @ self.text_proj

    def _embed_image(self, blobs, fmts) -> np.ndarray:
        out = np.zeros((len(blobs), 256), dtype=np.float64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                gray, _, _ = codecs.decode_luma(blob, fmt)
            except Exception:
                continue
            out[i] = np.bincount(gray.ravel().astype(np.int64),
                                 minlength=256)[:256]
        return out @ self.img_proj

    def __call__(self, batch: pa.Table) -> pa.Table:
        tv = self._embed_text(batch.column("caption").to_pylist())
        iv = self._embed_image(batch.column("bytes").to_pylist(),
                               batch.column("fmt").to_pylist())
        tn = np.linalg.norm(tv, axis=1)
        im = np.linalg.norm(iv, axis=1)
        denom = np.where((tn == 0) | (im == 0), 1.0, tn * im)
        score = (tv * iv).sum(axis=1) / denom
        return pa.table({
            "image_id": batch.column("image_id"),
            "align_milli": pa.array(
                np.floor(score * 1000.0 + 0.5).astype(np.int64))})
