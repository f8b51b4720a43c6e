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

Round-5 kernel shape (1.8x the round-4 kernel, measured):
  * horizontal shifts are grouped BY dx: each of the ~31 distinct dx values
    rolls the stripe ONCE (trimmed to the dy-span its pairs actually use)
    and every pair reads a static row slice of the rolled copy — the
    round-4 kernel paid 2 rolls per pair per word (512 rolls/stripe-word,
    the dominant VPU cost) because the words rode the grid and could not
    share rolls;
  * all 8 words are emitted in one grid step ([1, 8, TILE_R, TW] output
    block), so the rolled stripes are computed once per stripe, not once
    per (stripe, word);
  * the lane (width) axis is tiled with a 64-px halo so wide images fit
    the 16 MB VMEM scope (the un-tiled rolled stripes alone are ~15 MB at
    KITTI's 1241-px width): rolls wrap at tile edges, but every sampled
    column of a tile's center is >= 64 px from the edge, so the wrapped
    columns are never read (keypoints are additionally BORDER-clipped).

Bit order matches the gather path exactly (pair k lives in word k//32, bit
k%32).  Equivalence is pinned by tests/test_dense_brief.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import _BRIEF_PAIRS, _PATCH_RADIUS

_PAD = _PATCH_RADIUS      # 15: max |dy|, |dx| of the sampling pattern
_TILE_R = 32
_LANE = 128
_HALO = 64                # lane-tile halo (>= _PAD, half a lane group)
_MAX_TW = 640             # widest center tile: TW + 2*_HALO = 768 lanes
_WORDS = 8                # 256 bits / 32

# per-dx dy-span: rolling only the rows a dx's pairs read trims the rolled
# stripes' VMEM footprint ~25% (the pattern is Gaussian, so most spans are
# well inside +-_PAD)
_DX_SPAN = {}
for _k in range(256):
    for _pq in range(2):
        _dy, _dx = int(_BRIEF_PAIRS[_k, _pq, 0]), int(_BRIEF_PAIRS[_k, _pq, 1])
        _lo, _hi = _DX_SPAN.get(_dx, (_PAD + 1, -_PAD - 1))
        _DX_SPAN[_dx] = (min(_lo, _dy), max(_hi, _dy))
_DXS = sorted(_DX_SPAN)


def applicable_vmem_limit() -> int:
    """Scoped-VMEM budget for the bitplane kernel (bytes)."""
    return 32 * 1024 * 1024


def _brief_kernel(img_ref, out_ref):
    """Image b, stripe i, lane tile j: emit all 8 packed word planes.

    The stripe loads into VMEM once; each distinct dx rolls it once
    (trimmed to its dy-span) and all 256 pair comparisons read static row
    slices of the rolled copies — Mosaic CSEs nothing here, the sharing is
    structural."""
    i = pl.program_id(2)
    rows = _TILE_R
    tw = out_ref.shape[3]
    tw2 = tw + 2 * _HALO
    stripe = img_ref[0, 0, pl.ds(i * _TILE_R, rows + 2 * _PAD), :]

    rolled = {}
    for dx in _DXS:
        lo, hi = _DX_SPAN[dx]
        sub = stripe[_PAD + lo:_PAD + hi + rows, :]
        rolled[dx] = (pltpu.roll(sub, (-dx) % tw2, axis=1) if dx else sub)

    def rd(dy, dx):
        lo, _ = _DX_SPAN[dx]
        return rolled[dx][dy - lo:dy - lo + rows, _HALO:_HALO + tw]

    for word in range(_WORDS):
        acc = jnp.zeros((rows, tw), jnp.int32)
        for b in range(32):
            k = word * 32 + b
            pdy, pdx = (int(_BRIEF_PAIRS[k, 0, 0]),
                        int(_BRIEF_PAIRS[k, 0, 1]))
            qdy, qdx = (int(_BRIEF_PAIRS[k, 1, 0]),
                        int(_BRIEF_PAIRS[k, 1, 1]))
            bit = (rd(pdy, pdx) < rd(qdy, qdx)).astype(jnp.int32)
            acc = acc | (bit << b)
        out_ref[0, word] = acc


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
    # lane tiling: n_wt center tiles of TW (TW + 2*_HALO lanes each read),
    # image placed at column _HALO of the padded canvas
    n_wt = max(1, -(-W // _MAX_TW))
    TW = -(-(-(-W // n_wt)) // _LANE) * _LANE
    TW2 = TW + 2 * _HALO
    Wp = n_wt * TW + 2 * _HALO
    img_p = jnp.zeros((B, Hp + 2 * _PAD, Wp), smooth.dtype)
    img_p = jax.lax.dynamic_update_slice(img_p, smooth, (0, _PAD, _HALO))
    # halo'd lane tiles stacked on their own axis so the kernel's input
    # block is ONE tile (the whole padded image in VMEM was the OOM at
    # KITTI widths); the overlap copy is a cheap XLA gather
    tiles = jnp.stack(
        [img_p[:, :, j * TW:j * TW + TW2] for j in range(n_wt)], axis=1)

    out = pl.pallas_call(
        _brief_kernel,
        # the stripe index is INNERMOST so each lane tile's input block is
        # fetched once per (image, tile), not once per stripe
        grid=(B, n_wt, Hp // _TILE_R),
        in_specs=[pl.BlockSpec(
            (1, 1, Hp + 2 * _PAD, TW2), lambda b, j, i: (b, j, 0, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (1, _WORDS, _TILE_R, TW), lambda b, j, i: (b, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, _WORDS, Hp, n_wt * TW), jnp.int32),
        # the rolled stripes + double-buffered tiles need ~18 MB at KITTI
        # widths — above Mosaic's conservative 16 MB default scope but
        # comfortably inside v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=applicable_vmem_limit()),
        interpret=interpret,
    )(tiles)
    out = out[:, :, :H, :W]
    return out[0] if squeeze else out


def descriptors_from_planes(planes: jnp.ndarray, y: jnp.ndarray,
                            x: jnp.ndarray) -> jnp.ndarray:
    """Gather packed words at keypoints and unpack to signed int8 [N, 256]."""
    words = planes[:, y, x]                       # [8, N] int32
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = (words.T[:, :, None] >> shifts[None, None, :]) & 1   # [N, 8, 32]
    bits = bits.reshape(words.shape[1], 256)
    return jnp.where(bits > 0, jnp.int8(1), jnp.int8(-1))
