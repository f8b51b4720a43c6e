"""Fused Pallas TPU kernel for the FAST-9/16 corner score.

The XLA formulation in ops/features.py materializes 16 shifted full-image
copies plus ~290 elementwise min/max passes.  Honest round-3 measurement
(inside fused batched jits, v5e, 480x640): XLA ~1.2 ms/image and this
kernel statistically EQUAL — XLA fuses the rolled comparisons well — so
``use_pallas_fast`` stays off by default (and the kernel must not be
jax.vmap-ed: batched pallas outputs scope-allocate in VMEM; batch through
a grid like ops/brief_pallas.py if it is ever batched).
This kernel computes the identical score with the image resident in VMEM:

  * the padded image (a camera image is ~2 MB, far under the ~16 MB VMEM)
    is loaded once; the grid walks row stripes sliced out with pl.ds, so
    halos are free — no overlapping-block DMA;
  * the 16 cyclic 9-arc minima/maxima are computed with a doubling scheme
    (min over 9 = min(min8, shifted plane), min8 via three halving levels),
    cutting the elementwise ops from ~290 to ~100 per pixel — all VPU;
  * score = max(max_k arcmin_bright[k], max_k arcmin_dark[k]) with
    dark = -bright, i.e. -min_k arcmax_bright[k] — only the bright diffs
    are ever materialized.

Equivalence with ops/features.fast_scores is asserted in
tests/test_fast_pallas.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import _FAST_OFFSETS, _ARC_LENGTH

_PAD = 3          # Bresenham circle radius
_TILE_R = 32      # rows per grid step (bounds live VMEM plane sets)
_LANE = 128


def _fast_kernel(img_ref, out_ref, *, threshold: float):
    """Image b, stripe i: read [TILE_R + 6, Wp] rows of the resident image.

    Batching rides the grid's leading dimension (never jax.vmap): unlike
    the XLA path — whose 16-way rolled stack materializes [16, B, H, W]
    intermediates that blow the fusion buffers past B≈4 (measured round 4:
    0.3 -> 1.45 ms/frame from B=2 to B=32) — the stripes stay in VMEM and
    HBM traffic is read-image + write-score regardless of B."""
    i = pl.program_id(1)
    rows = _TILE_R
    stripe = img_ref[0, pl.ds(i * _TILE_R, rows + 2 * _PAD), :]
    center = stripe[_PAD:_PAD + rows, :]

    # 16 shifted diffs (bright polarity); vertical shifts are static slices
    # of the stripe, horizontal shifts are lane rolls (zero-padded borders
    # are masked by the detector's BORDER margin downstream).
    bright = []
    for dy, dx in _FAST_OFFSETS:
        s = stripe[_PAD + int(dy):_PAD + int(dy) + rows, :]
        if int(dx) != 0:
            # pltpu.roll requires a non-negative shift; -dx mod Wp is the
            # same circular shift
            s = pltpu.roll(s, (-int(dx)) % s.shape[1], axis=1)
        bright.append(s - center)

    # cyclic window min/max over _ARC_LENGTH = 9 consecutive of 16 planes:
    # w9[k] = reduce(b[k..k+8]) = reduce(m8[k], b[k+8]),
    # m8[k] = reduce(m4[k], m4[k+4]), m4[k] = reduce(m2[k], m2[k+2]),
    # m2[k] = reduce(b[k], b[k+1])
    def doubling(planes, op):
        m2 = [op(planes[k], planes[(k + 1) % 16]) for k in range(16)]
        m4 = [op(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [op(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        return [op(m8[k], planes[(k + 8) % 16]) for k in range(16)]

    assert _ARC_LENGTH == 9
    wmin = doubling(bright, jnp.minimum)
    wmax = doubling(bright, jnp.maximum)

    bright_score = functools.reduce(jnp.maximum, wmin)
    dark_score = -functools.reduce(jnp.minimum, wmax)
    score = jnp.maximum(bright_score, dark_score)
    out_ref[0] = jnp.where(score > threshold, score, 0.0)


def fast_scores_pallas(image: jnp.ndarray, threshold: float,
                       interpret: bool = False) -> jnp.ndarray:
    """Per-pixel FAST-9/16 score (identical to features.fast_scores).

    image: [H, W] -> [H, W] float32;  [B, H, W] -> [B, H, W] (batched
    natively through the grid — safe to any B).
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    B, H, W = image.shape
    Hp = -(-H // _TILE_R) * _TILE_R
    Wp = -(-(W + 2 * _PAD) // _LANE) * _LANE
    img_p = jnp.zeros((B, Hp + 2 * _PAD, Wp), image.dtype)
    img_p = jax.lax.dynamic_update_slice(img_p, image, (0, _PAD, _PAD))

    kernel = functools.partial(_fast_kernel, threshold=float(threshold))
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // _TILE_R),
        in_specs=[pl.BlockSpec(
            (1, Hp + 2 * _PAD, Wp), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (1, _TILE_R, Wp), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(img_p)
    out = out[:, :H, _PAD:_PAD + W]
    return out[0] if squeeze else out
