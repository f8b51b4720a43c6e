"""Benchmark: steady-state tracker frames/s on the bundled KITTI frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition mirrors the reference's mean_frame_hz (processed messages
divided by summed per-message compute time, reference
srrg2_proslam/apps/app_benchmark.cpp:350-366).  The baseline divisor is the
reference CI target regime (an unspecified CPU; the original ProSLAM paper
reports well-above-real-time on desktop CPUs, so 100 Hz is used as the
reference-class anchor until a measured C++ number exists).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from srrg2_proslam_tpu.io import datasets
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig, adapt_stereo
from srrg2_proslam_tpu.models.tracker import TrackerConfig, initial_state, track_step

REFERENCE_FRAME_HZ = 100.0  # reference-class CPU anchor (see module docstring)


def main():
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "test_data")
    frames = list(datasets.iter_bundled_kitti(root, "city"))
    cam = datasets.kitti_camera(*frames[0].left.shape)
    acfg = StereoAdaptorConfig()
    tcfg = TrackerConfig()

    images = [(jnp.asarray(f.left), jnp.asarray(f.right)) for f in frames]

    # warmup: compile both stages and populate the map
    state = initial_state(4096)
    for left, right in images:
        meas = adapt_stereo(left, right, acfg)
        state, stats, X = track_step(
            state, meas.points, meas.desc, meas.valid, cam, tcfg, "stereo"
        )
    jax.block_until_ready(state.T_lm_robot)

    # timed steady-state loop over the sequence (device-resident inputs)
    n_reps = 8
    t0 = time.perf_counter()
    count = 0
    for _ in range(n_reps):
        for left, right in images:
            meas = adapt_stereo(left, right, acfg)
            state, stats, X = track_step(
                state, meas.points, meas.desc, meas.valid, cam, tcfg, "stereo"
            )
            count += 1
    jax.block_until_ready(state.T_lm_robot)
    dt = time.perf_counter() - t0

    hz = count / dt
    print(json.dumps({
        "metric": "mean_frame_hz",
        "value": round(hz, 2),
        "unit": "frames/s",
        "vs_baseline": round(hz / REFERENCE_FRAME_HZ, 3),
    }))


if __name__ == "__main__":
    main()
