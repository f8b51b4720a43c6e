"""BOSS-JSON message log reader/writer (reference F11 dataset surface).

The reference consumes datasets exclusively as BOSS-serialized message logs
(``messages.json``) produced by its converters (reference
srrg2_proslam/apps/convert_stereo_to_srrg2.cpp, wired through
MessageFileSource -> MessageSourcePlatform -> MessageSortedSource ->
MessageSynchronizedSource, configurations/kitti.conf:617-745).  A log is a
sequence of BOSS blocks — the same ``"ClassName" { json-with-//-comments }``
syntax as the shipped ``.conf`` files — one per message:

  * ``ImageMessage``: topic, frame_id, seq, timestamp, image payload;
  * ``CameraInfoMessage``: projection model + 3x3 camera matrix (+depth
    scale) — the camera-info-driven initialization source
    (apps/app_benchmark.cpp:56-74);
  * ``TransformEventsMessage``: TF events (stereo extrinsic
    camera_right-in-camera_left; optional ground-truth camera-in-world).

This module parses that structural format and reassembles synchronized
stereo / RGB-D frames plus the camera model, so reference-converted logs
drive the pipeline unmodified.  Image payloads: srrg2_core stores pixels as
library-internal binary BLOBs; this reader accepts the ``image_file``
indirection (payload stored as an ordinary image file next to the log, what
:func:`write_boss_stereo` emits) and inline ``image_data`` nested uint8
rows.  Binary-BLOB decoding of the exact srrg2_core layout is NOT
re-implemented — logs must be written with file-referenced payloads (the
converter flag does this), which the round-trip test pins.
"""
from __future__ import annotations

import json
import os
import re
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .datasets import StereoFrame, RGBDFrame, load_gray
from ..ops.pinhole import Camera


# ---------------------------------------------------------------------------
# block-level parsing (shared syntax with the reference .conf files)
# ---------------------------------------------------------------------------

def _strip_comments(text: str) -> str:
    """Remove //-comments outside of string literals."""
    out = []
    in_str = False
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


_BLOCK_HEAD = re.compile(r'"([A-Za-z_][A-Za-z0-9_]*)"\s*\{')


def parse_boss(text: str) -> List[Tuple[str, dict]]:
    """Parse BOSS block text -> [(class_name, payload_dict), ...]."""
    text = _strip_comments(text)
    objects = []
    pos = 0
    while True:
        m = _BLOCK_HEAD.search(text, pos)
        if m is None:
            break
        depth = 0
        i = m.end() - 1  # at the '{'
        in_str = False
        while i < len(text):
            c = text[i]
            if in_str:
                if c == "\\":
                    i += 1
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        body = text[m.end() - 1:i + 1]
        objects.append((m.group(1), json.loads(body)))
        pos = i + 1
    return objects


def parse_boss_file(path: str) -> List[Tuple[str, dict]]:
    with open(path) as f:
        return parse_boss(f.read())


# ---------------------------------------------------------------------------
# message-level reassembly
# ---------------------------------------------------------------------------

def _load_image(payload: dict, base_dir: str) -> np.ndarray:
    if "image_file" in payload:
        return load_gray(os.path.join(base_dir, payload["image_file"]))
    if "image_data" in payload:
        return np.asarray(payload["image_data"], np.float32)
    raise ValueError(
        "ImageMessage carries no supported payload (expected 'image_file' "
        "or inline 'image_data'; srrg2_core binary BLOBs are not decoded)")


def boss_camera(path: str, topic_hint: str = "") -> Optional[Camera]:
    """Camera model from the log's CameraInfoMessage + TF stereo baseline.

    The reference initializers consume exactly these messages
    (InitializerStereoCamera3D, apps/app_benchmark.cpp:56-74).
    """
    K = None
    rows = cols = None
    baseline_m = 0.0
    depth_scale = 1.0
    for name, obj in parse_boss_file(path):
        if name == "CameraInfoMessage" and K is None:
            if topic_hint and topic_hint not in obj.get("topic", ""):
                continue
            K = np.asarray(obj["camera_matrix"], np.float64).reshape(3, 3)
            depth_scale = float(obj.get("depth_scale", 1.0))
            rows = obj.get("rows")
            cols = obj.get("cols")
        elif name == "ImageMessage" and rows is None:
            rows = obj.get("image_rows")
            cols = obj.get("image_cols")
        elif name == "TransformEventsMessage":
            for ev in obj.get("events", []):
                if (ev.get("child_frame") == "camera_right"
                        and ev.get("parent_frame") == "camera_left"):
                    T = np.asarray(ev["transform"], np.float64).reshape(4, 4)
                    baseline_m = abs(float(T[0, 3]))
        if K is not None and rows is not None and baseline_m:
            break
    if K is None:
        return None
    return Camera(
        fx=float(K[0, 0]), fy=float(K[1, 1]),
        cx=float(K[0, 2]), cy=float(K[1, 2]),
        rows=int(rows or 0), cols=int(cols or 0),
        baseline_px=float(K[0, 0]) * baseline_m,
        range_min=0.1, range_max=300.0,
    )


def iter_boss_stereo(path: str, count: Optional[int] = None,
                     sync_threshold_s: float = 0.01
                     ) -> Iterator[StereoFrame]:
    """Synchronized stereo frames from a BOSS message log.

    MessageSynchronizedSource analog (kitti.conf:144-162): left/right
    ImageMessages pair when their timestamps agree within
    ``sync_threshold_s``; ground-truth camera_left-in-world TF events
    attach to the paired frame.
    """
    base_dir = os.path.dirname(os.path.abspath(path))
    left = {}
    right = {}
    gts = {}
    order = []
    for name, obj in parse_boss_file(path):
        if name == "ImageMessage":
            ts = float(obj["timestamp"])
            frame = obj.get("frame_id", "")
            if "left" in frame or "left" in obj.get("topic", ""):
                left[ts] = obj
                order.append(ts)
            else:
                right[ts] = obj
        elif name == "TransformEventsMessage":
            for ev in obj.get("events", []):
                if (ev.get("child_frame") == "camera_left"
                        and ev.get("parent_frame") == "world"):
                    gts[float(obj["timestamp"])] = np.asarray(
                        ev["transform"], np.float32).reshape(4, 4)
    right_ts = sorted(right)
    emitted = 0
    for ts in order:
        # nearest right timestamp within the synchronization threshold
        if not right_ts:
            break
        idx = int(np.searchsorted(right_ts, ts))
        best, best_dt = None, sync_threshold_s
        for k in (idx - 1, idx):
            if 0 <= k < len(right_ts):
                dt = abs(right_ts[k] - ts)
                if dt <= best_dt:
                    best, best_dt = right_ts[k], dt
        if best is None:
            continue
        yield StereoFrame(
            timestamp=ts,
            left=_load_image(left[ts], base_dir),
            right=_load_image(right[best], base_dir),
            gt_pose=gts.get(ts),
        )
        emitted += 1
        if count is not None and emitted >= count:
            return


# ---------------------------------------------------------------------------
# writer (the converter's output format, A4 parity)
# ---------------------------------------------------------------------------

def _block(name: str, payload: dict) -> str:
    return f'"{name}" {json.dumps(payload, indent=1)}\n\n'


def write_boss_stereo(path: str, frames, camera: Camera,
                      baseline_m: Optional[float] = None,
                      image_format: str = "png") -> int:
    """Write stereo frames as a BOSS message log + image payload files.

    Emits per frame the same message triplet as the reference converter
    (convert_stereo_to_srrg2.cpp:113-180): two ImageMessages, a
    CameraInfoMessage per camera image, and a TransformEventsMessage with
    the stereo extrinsic (+ ground truth when present).  Payload pixels go
    to ``<log>.d/`` as ordinary image files referenced by ``image_file``.
    """
    from .datasets import save_gray

    base_dir = os.path.dirname(os.path.abspath(path))
    payload_dir = os.path.basename(path) + ".d"
    os.makedirs(os.path.join(base_dir, payload_dir), exist_ok=True)
    if baseline_m is None:
        baseline_m = camera.baseline_px / camera.fx
    K = [[camera.fx, 0.0, camera.cx],
         [0.0, camera.fy, camera.cy],
         [0.0, 0.0, 1.0]]
    T_right_in_left = np.eye(4)
    T_right_in_left[0, 3] = -baseline_m
    n = 0
    with open(path, "w") as f:
        for seq, fr in enumerate(frames):
            for side, img in (("left", fr.left), ("right", fr.right)):
                rel = f"{payload_dir}/{side}_{seq:06d}.{image_format}"
                save_gray(os.path.join(base_dir, rel), img)
                f.write(_block("ImageMessage", {
                    "topic": f"/camera_{side}/image_raw",
                    "frame_id": f"camera_{side}",
                    "seq": seq,
                    "timestamp": fr.timestamp,
                    "image_rows": int(np.asarray(img).shape[0]),
                    "image_cols": int(np.asarray(img).shape[1]),
                    "image_file": rel,
                }))
                f.write(_block("CameraInfoMessage", {
                    "topic": f"/camera_{side}/image_raw/info",
                    "frame_id": f"camera_{side}",
                    "seq": seq,
                    "timestamp": fr.timestamp,
                    "depth_scale": 1.0,
                    "projection_model": "pinhole",
                    "distortion_model": "undistorted",
                    "camera_matrix": [x for row in K for x in row],
                }))
            events = [dict(child_frame="camera_right",
                           parent_frame="camera_left",
                           transform=[x for row in T_right_in_left
                                      for x in row])]
            if fr.gt_pose is not None:
                events.append(dict(
                    child_frame="camera_left", parent_frame="world",
                    transform=[float(x) for x in
                               np.asarray(fr.gt_pose).ravel()]))
            f.write(_block("TransformEventsMessage", {
                "topic": "/tf",
                "frame_id": "camera_left",
                "seq": seq,
                "timestamp": fr.timestamp,
                "events": events,
            }))
            n += 1
    return n
