"""Dense BRIEF-256 bitplanes as a fused Pallas TPU kernel.

The gather-based descriptor path (ops/features.compute_descriptors) issues
2 x 256 per-keypoint scalar gathers per image — ~590k random accesses that
cost ~8 ms/image on v5e (measured round 3: the single largest consumer in
the whole pipeline, 16 of the ~29 ms/frame chunk budget).  TPUs hate
scalar gathers; they love dense regular sweeps.

This kernel computes the descriptor bit for EVERY pixel instead: bit k of
pixel (y, x) is ``smooth[y+p_k] < smooth[y+q_k]`` — 256 shifted comparisons
over the VMEM-resident image, packed on the fly into 8 int32 bitplanes
[8, H, W].  Extracting a keypoint's descriptor then needs just 8 word
gathers (+ an elementwise unpack), a ~70x reduction in random accesses.
HBM traffic: read the image once, write 8 int32 planes (~11 MB at 480x640)
— ~0.1 ms of bandwidth.  The shifted reads come from static stripe slices
(vertical) and lane rolls (horizontal), so there is no gather at all inside
the kernel.

Bit order matches the gather path exactly (pair k lives in word k//32, bit
k%32); keypoints are BORDER-clipped so the roll wrap-around columns are
never sampled.  Equivalence is pinned by tests/test_dense_brief.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import _BRIEF_PAIRS, _PATCH_RADIUS

_PAD = _PATCH_RADIUS      # 15: max |dy|, |dx| of the sampling pattern
_TILE_R = 32
_LANE = 128
_WORDS = 8                # 256 bits / 32


def _brief_kernel(img_ref, out_ref):
    """Image b, word w, stripe i: emit one packed int32 word plane.

    Batching AND the 8 words ride the GRID (never jax.vmap) in a single
    launch — the image loads into VMEM once and stays resident across all
    word/stripe steps, unlike the round-3 8-launch scheme.  The word index
    is a grid coordinate, so the per-word static shift pattern is selected
    with a lax.switch over 8 statically-unrolled branches.  The output
    BLOCK is [1, 1, TILE_R, Wp] (~160 KB): blocking only trailing dims is
    what the Mosaic VMEM scoper accepts — a [1, 8, TILE_R, Wp] block OOMs
    the 16 MB scope at KITTI widths."""
    w = pl.program_id(1)
    i = pl.program_id(2)
    rows = _TILE_R
    stripe = img_ref[0, pl.ds(i * _TILE_R, rows + 2 * _PAD), :]

    def shifted(dy, dx):
        s = stripe[_PAD + dy:_PAD + dy + rows, :]
        if dx != 0:
            s = pltpu.roll(s, (-dx) % s.shape[1], axis=1)
        return s

    def word_branch(word):
        def f():
            acc = jnp.zeros((rows, stripe.shape[1]), jnp.int32)
            for b in range(32):
                k = word * 32 + b
                pdy, pdx = (int(_BRIEF_PAIRS[k, 0, 0]),
                            int(_BRIEF_PAIRS[k, 0, 1]))
                qdy, qdx = (int(_BRIEF_PAIRS[k, 1, 0]),
                            int(_BRIEF_PAIRS[k, 1, 1]))
                bit = (shifted(pdy, pdx)
                       < shifted(qdy, qdx)).astype(jnp.int32)
                acc = acc | (bit << b)
            return acc
        return f

    out_ref[0, 0] = jax.lax.switch(
        w, [word_branch(word) for word in range(_WORDS)])


def brief_bitplanes(smooth: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Smoothed image(s) -> packed BRIEF bitplanes.

    [H, W] -> [8, H, W] int32;  [B, H, W] -> [B, 8, H, W] int32 (batched
    natively through the grid — safe to any B).
    """
    squeeze = smooth.ndim == 2
    if squeeze:
        smooth = smooth[None]
    B, H, W = smooth.shape
    Hp = -(-H // _TILE_R) * _TILE_R
    Wp = -(-(W + 2 * _PAD) // _LANE) * _LANE
    img_p = jnp.zeros((B, Hp + 2 * _PAD, Wp), smooth.dtype)
    img_p = jax.lax.dynamic_update_slice(img_p, smooth, (0, _PAD, _PAD))

    out = pl.pallas_call(
        _brief_kernel,
        grid=(B, _WORDS, Hp // _TILE_R),
        in_specs=[pl.BlockSpec(
            (1, Hp + 2 * _PAD, Wp), lambda b, w, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (1, 1, _TILE_R, Wp), lambda b, w, i: (b, w, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, _WORDS, Hp, Wp), jnp.int32),
        interpret=interpret,
    )(img_p)
    out = out[:, :, :H, _PAD:_PAD + W]
    return out[0] if squeeze else out


def descriptors_from_planes(planes: jnp.ndarray, y: jnp.ndarray,
                            x: jnp.ndarray) -> jnp.ndarray:
    """Gather packed words at keypoints and unpack to signed int8 [N, 256]."""
    words = planes[:, y, x]                       # [8, N] int32
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = (words.T[:, :, None] >> shifts[None, None, :]) & 1   # [N, 8, 32]
    bits = bits.reshape(words.shape[1], 256)
    return jnp.where(bits > 0, jnp.int8(1), jnp.int8(-1))
