"""Image-curation operators: area resize exactness, quality-gate
thresholds, caption-align batching invariance (ops/multimodal.py)."""

import numpy as np
import pyarrow as pa

from hepcrawl_ray import codecs
from hepcrawl_ray.ops.multimodal import (CaptionAlignStage,
                                         ImageQualityStage, area_resize)


def test_area_resize_block_means():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = area_resize(px, 2, 2)
    expect = np.array([[np.floor(px[:2, :2].mean() + 0.5),
                        np.floor(px[:2, 2:].mean() + 0.5)],
                       [np.floor(px[2:, :2].mean() + 0.5),
                        np.floor(px[2:, 2:].mean() + 0.5)]],
                      dtype=np.uint8)
    assert (out == expect).all()


def test_area_resize_constant_and_dtype():
    px = np.full((30, 50, 3), 77, dtype=np.uint8)
    out = area_resize(px, 7, 13)
    assert out.shape == (7, 13, 3)
    assert out.dtype == np.uint8
    assert (out == 77).all()


def test_area_resize_non_divisible_preserves_mean():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(17, 23), dtype=np.uint8).astype(np.uint8)
    out = area_resize(px, 5, 7)
    assert abs(float(out.mean()) - float(px.mean())) < 8.0


def test_area_resize_upsample_nearest():
    px = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    out = area_resize(px, 4, 4)
    assert out.shape == (4, 4)
    assert out[0, 0] == 1 and out[3, 3] == 4


def _img_batch(pixels_list, ids=None, captions=None):
    blobs = [codecs.encode_png(p) for p in pixels_list]
    n = len(blobs)
    cols = {"image_id": pa.array(ids or [f"i{k}" for k in range(n)]),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["png"] * n)}
    if captions is not None:
        cols["caption"] = pa.array(captions)
    return pa.table(cols)


def test_quality_gate_thresholds():
    rng = np.random.default_rng(5)
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)          # no contrast
    noisy = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    tiny = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    skinny = rng.integers(0, 256, size=(16, 160, 3)).astype(np.uint8)
    out = ImageQualityStage()(_img_batch([flat, noisy, tiny, skinny]))
    d = {r["image_id"]: r for r in out.to_pylist()}
    assert d["i0"]["passed"] == 0 and d["i0"]["contrast_milli"] == 0
    assert d["i1"]["passed"] == 1
    assert d["i2"]["passed"] == 0          # min side
    assert d["i3"]["passed"] == 0          # aspect 10:1
    assert d["i3"]["aspect_milli"] == 10000


def test_quality_gate_undecodable_row():
    t = pa.table({"image_id": pa.array(["bad"]),
                  "bytes": pa.array([b"notanimage"], pa.binary()),
                  "fmt": pa.array(["png"])})
    out = ImageQualityStage()(t).to_pylist()[0]
    assert out["decoded"] is False and out["passed"] == 0


def test_caption_align_batching_invariant():
    rng = np.random.default_rng(9)
    pix = [rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
           for _ in range(6)]
    caps = [f"the quick image number {i} shows pattern {i * 7}"
            for i in range(6)]
    batch = _img_batch(pix, captions=caps)
    stage = CaptionAlignStage()
    whole = stage(batch).to_pylist()
    single = [stage(batch.slice(i, 1)).to_pylist()[0] for i in range(6)]
    assert whole == single
    assert all(-1000 <= r["align_milli"] <= 1000 for r in whole)


def test_caption_align_deterministic_across_instances():
    rng = np.random.default_rng(13)
    pix = [rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)]
    batch = _img_batch(pix, captions=["a lone test caption"])
    a = CaptionAlignStage()(batch).to_pylist()
    b = CaptionAlignStage()(batch).to_pylist()
    assert a == b


def test_image_dedup_pipeline_collapses_probes(ray_session):
    from hepcrawl_ray.pipelines.queries import (_PROBE_OFFSET,
                                                q_image_dedup_pipeline)

    out = q_image_dedup_pipeline("/root/testdata/sf0.001").to_pandas()
    # every original decoded and its real phash matched the corpus
    originals = out[out["img_num"] < _PROBE_OFFSET]
    assert len(originals) == 150
    assert originals["verified"].all()
    probes = out[out["img_num"] >= _PROBE_OFFSET]
    assert len(probes) == len(originals[originals["img_num"] % 20 == 0])
    roots = out.set_index("img_num")["root"]
    keeps = out.set_index("img_num")["keep"]
    same_comp = 0
    for pid in probes["img_num"]:
        orig = pid - _PROBE_OFFSET
        if roots[pid] == roots[orig]:
            same_comp += 1
            # exactly one of the pair survives within its component
            assert keeps[pid] + keeps[orig] <= 1
    # phash drift is 0-4 bits vs max_distance=6: all must collapse
    assert same_comp == len(probes)


# ---------------------------------------------------------------- patches --

def _patch_stage_run(px_list, patch=8, blank_var_milli=1000):
    from hepcrawl_ray.ops.multimodal import ImagePatchStage

    t = pa.table({
        "image_id": pa.array([f"im{i}" for i in range(len(px_list))]),
        "bytes": pa.array([codecs.encode_png(px) for px in px_list],
                          pa.binary()),
        "fmt": pa.array(["png"] * len(px_list)),
    })
    stage = ImagePatchStage(patch=patch, blank_var_milli=blank_var_milli)
    return stage(t).to_pandas()


def test_patch_stage_constant_image_all_blank():
    px = np.full((16, 24, 3), 99, np.uint8)
    out = _patch_stage_run([px])
    r = out.iloc[0]
    assert r["decoded"] and r["grid_h"] == 2 and r["grid_w"] == 3
    assert r["n_patches"] == 6 and r["n_blank"] == 6
    assert r["mean_patch_var_milli"] == 0


def test_patch_stage_mixed_blank_count_exact():
    # left 8x8 patch constant (blank), right 8x8 patch checkerboard
    px = np.zeros((8, 16, 3), np.uint8)
    px[:, 8:, :] = (np.indices((8, 8)).sum(axis=0) % 2)[..., None] \
        .astype(np.uint8) * 255
    out = _patch_stage_run([px])
    r = out.iloc[0]
    assert r["n_patches"] == 2 and r["n_blank"] == 1
    # checkerboard luma alternates 0/255: variance = (255/2)^2 exactly
    # -> mean over the two patches = var/2; milli floor on both steps
    n = 64
    s = 32 * 255
    ss = 32 * 255 * 255
    var_num = n * ss - s * s
    expect = 1000 * var_num // (n * n * 2)
    assert r["mean_patch_var_milli"] == expect


def test_patch_stage_crops_edge_remainders():
    px = np.zeros((20, 20, 3), np.uint8)
    out = _patch_stage_run([px])
    r = out.iloc[0]
    assert r["grid_h"] == 2 and r["grid_w"] == 2  # 20//8


def test_patch_stage_tiny_and_garbled_rows():
    from hepcrawl_ray.ops.multimodal import ImagePatchStage

    px = np.zeros((4, 4, 3), np.uint8)           # smaller than a patch
    t = pa.table({
        "image_id": pa.array(["small", "bad"]),
        "bytes": pa.array([codecs.encode_png(px), b"garbage"],
                          pa.binary()),
        "fmt": pa.array(["png", "png"]),
    })
    out = ImagePatchStage()(t).to_pandas()
    small, bad = out.iloc[0], out.iloc[1]
    assert small["decoded"] and small["n_patches"] == 0
    assert not bad["decoded"] and bad["n_patches"] == 0


def test_patch_stage_partitioning_invariant():
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8)
            for _ in range(6)]
    whole = _patch_stage_run(imgs)
    halves = np.concatenate([
        _patch_stage_run(imgs[:3])["mean_patch_var_milli"],
        _patch_stage_run(imgs[3:])["mean_patch_var_milli"]])
    assert (whole["mean_patch_var_milli"].to_numpy() == halves).all()


def test_phash_retrieval_matches_flat_scan(ray_session):
    from hepcrawl_ray.ops.text import hamming64
    from hepcrawl_ray.pipelines.queries import QUERIES, _crawl_tables

    sf = "/root/testdata/sf0.001"
    got = QUERIES["image_phash_retrieval"](sf).to_pandas()
    images, _, _, _ = _crawl_tables(sf)
    ids = np.array(images.column("image_id").to_pylist(), dtype=object)
    sigs = images.column("phash").to_numpy().astype(np.int64)
    probes = [ids[i] for i in (0, 7, 23)]

    assert set(got["probe_id"]) == set(str(p) for p in probes)
    for pi, pid in enumerate(probes):
        psig = sigs[list(ids).index(pid)]
        mask = ids != pid
        d = hamming64(sigs[mask], np.full(mask.sum(), psig, np.int64))
        order = np.lexsort((ids[mask].astype("U"), d))[:10]
        want = list(ids[mask][order])
        mine = (got[got["probe_id"] == str(pid)]
                .sort_values("rank")["neighbor_id"].tolist())
        assert mine == [str(w) for w in want]
        # ranks are 1..10 and hamming is non-decreasing
        sub = got[got["probe_id"] == str(pid)].sort_values("rank")
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))
        assert (np.diff(sub["hamming"].to_numpy()) >= 0).all()


def test_sharpness_stage_constant_vs_checkerboard():
    from hepcrawl_ray.ops.multimodal import ImageSharpnessStage

    flat = np.full((16, 16, 3), 128, np.uint8)
    checker = (np.indices((16, 16)).sum(axis=0) % 2)[..., None] \
        .astype(np.uint8) * 255
    checker = np.repeat(checker, 3, axis=2)
    tiny = np.zeros((2, 2, 3), np.uint8)
    t = pa.table({
        "image_id": pa.array(["flat", "checker", "tiny", "bad"]),
        "bytes": pa.array([codecs.encode_png(flat),
                           codecs.encode_png(checker),
                           codecs.encode_png(tiny), b"nope"],
                          pa.binary()),
        "fmt": pa.array(["png"] * 4),
    })
    out = ImageSharpnessStage()(t).to_pandas().set_index("image_id")
    assert out.loc["flat", "sharpness_milli"] == 0
    assert not out.loc["flat", "is_sharp"]
    # checkerboard: every interior Laplacian is ±8·255 — max contrast
    assert out.loc["checker", "sharpness_milli"] > 1_000_000
    assert out.loc["checker", "is_sharp"]
    assert out.loc["tiny", "decoded"] and \
        out.loc["tiny", "sharpness_milli"] == -1
    assert not out.loc["bad", "decoded"]


def test_sharpness_integer_exact_reference():
    from hepcrawl_ray.ops.multimodal import ImageSharpnessStage

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8) \
        .astype(np.uint8)
    t = pa.table({"image_id": pa.array(["x"]),
                  "bytes": pa.array([codecs.encode_png(px)], pa.binary()),
                  "fmt": pa.array(["png"])})
    got = int(ImageSharpnessStage()(t).column("sharpness_milli")[0]
              .as_py())
    luma, w, h = codecs.decode_luma(codecs.encode_png(px), "png")
    v = luma.astype(np.int64)
    lap = (4 * v[1:-1, 1:-1] - v[:-2, 1:-1] - v[2:, 1:-1]
           - v[1:-1, :-2] - v[1:-1, 2:]).ravel()
    m = len(lap)
    want = 1000 * (m * int((lap * lap).sum()) - int(lap.sum()) ** 2) \
        // (m * m)
    assert got == want
