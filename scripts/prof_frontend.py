"""Per-stage device timing of the stereo adaptor on the real TPU.

Breaks the 23 ms/frame adaptor (BENCH_r02) into: FAST score (XLA vs
Pallas), NMS+border, per-region top-k, sub-pixel, BRIEF descriptors,
epipolar match, sub-pixel disparity.  Run on the real chip:
    python scripts/prof_frontend.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srrg2_proslam_tpu.io import datasets
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig, adapt_stereo
from srrg2_proslam_tpu.ops import features as F
from srrg2_proslam_tpu.ops.fast_pallas import fast_scores_pallas
from srrg2_proslam_tpu.ops.matching import match_epipolar
from srrg2_proslam_tpu.ops.subpixel import refine_disparity


def timed(fn, *args, n=30, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt * 1e3:8.3f} ms")
    return out


def main():
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "test_data")
    frames = list(datasets.iter_bundled_kitti(root, "city"))
    left = jnp.asarray(frames[0].left)
    right = jnp.asarray(frames[0].right)
    print(f"image {left.shape} {left.dtype}")
    acfg = StereoAdaptorConfig()
    ecfg = acfg.extractor

    timed(jax.jit(lambda l, r: adapt_stereo(l, r, acfg)), left, right,
          label="adapt_stereo (full)")

    # stage 1: FAST scores
    fs_xla = jax.jit(lambda im: F.fast_scores(im, ecfg.detector_threshold))
    timed(fs_xla, left, label="fast_scores XLA")
    fs_pl = jax.jit(lambda im: fast_scores_pallas(im, ecfg.detector_threshold))
    timed(fs_pl, left, label="fast_scores Pallas")
    a = np.asarray(fs_xla(left))
    b = np.asarray(fs_pl(left))
    print(f"  pallas == xla: {np.allclose(a, b, atol=1e-4)}")

    # stage 2: detect (score+nms+topk+subpix)
    det = jax.jit(lambda im: F.detect_keypoints(im, ecfg))
    uv, resp, valid = timed(det, left, label="detect_keypoints (whole)")

    # nms + border only
    score = fs_xla(left)
    def nms_border(s):
        pooled = F._maxpool2d(s, ecfg.nms_window)
        s = jnp.where(s >= pooled, s, 0.0)
        H, W = s.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inb = ((row >= F.BORDER) & (row < H - F.BORDER)
               & (col >= F.BORDER) & (col < W - F.BORDER))
        return jnp.where(inb, s, 0.0)
    timed(jax.jit(nms_border), score, label="nms+border")

    # top-k per region
    def topk(s):
        H, W = s.shape
        gr, gc = ecfg.grid_rows, ecfg.grid_cols
        n_regions = gr * gc
        k_region = ecfg.max_keypoints // n_regions
        Hp = -(-H // gr) * gr
        Wp = -(-W // gc) * gc
        sp = jnp.pad(s, ((0, Hp - H), (0, Wp - W)))
        rh, cw = Hp // gr, Wp // gc
        regions = sp.reshape(gr, rh, gc, cw).transpose(0, 2, 1, 3).reshape(
            n_regions, rh * cw)
        return jax.lax.top_k(regions, k_region)
    timed(jax.jit(topk), score, label="per-region top_k")

    # descriptors
    desc_fn = jax.jit(lambda im, uv, v: F.compute_descriptors(im, uv, v, ecfg))
    desc = timed(desc_fn, left, uv, valid, label="compute_descriptors (BRIEF)")

    # boxfilter alone
    timed(jax.jit(lambda im: F._boxfilter(im, ecfg.smoothing_window)), left,
          label="  boxfilter 5x5")

    # epipolar match
    feats_l = jax.jit(lambda im: F.extract_features(im, ecfg))(left)
    feats_r = jax.jit(lambda im: F.extract_features(im, ecfg))(right)
    jax.block_until_ready((feats_l, feats_r))
    em = jax.jit(lambda a, b, c, d, e, f: match_epipolar(
        a, b, c, d, e, f, acfg.matcher))
    m = timed(em, feats_l.uv, feats_l.desc, feats_l.valid,
              feats_r.uv, feats_r.desc, feats_r.valid,
              label="match_epipolar")

    # subpixel disparity
    idx = jnp.maximum(m.idx, 0)
    uvr = feats_r.uv[idx]
    timed(jax.jit(lambda l, r, a, b: refine_disparity(l, r, a, b)),
          left, right, feats_l.uv, uvr, label="refine_disparity")

    # batched L/R extract (as adapt_stereo does)
    both = jnp.stack([left, right])
    ext2 = jax.jit(jax.vmap(lambda im: F.extract_features(im, ecfg)))
    timed(ext2, both, label="extract_features x2 (vmapped)")


if __name__ == "__main__":
    main()
