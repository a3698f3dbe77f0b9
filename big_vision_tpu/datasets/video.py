"""Video DataSource: the DMVR-replacement reader the video configs need.

The reference ships its six video transfer configs (activitynet_cap/qa,
msrvtt_cap/qa, msvd_qa, vatex_cap) with `raise NotImplementedError("Please
implement a video reader of choice!")` — users must bring DeepMind Video
Readers (ref configs/proj/paligemma/transfers/activitynet_cap.py:58-71).
This module implements that reader contract natively so the same configs
run here with `reader=bv:video`:

  name/dataset_name/split/num_frames/stride/deterministic_fs/first_k_shards

Dataset layout (`{data_dir}/{dataset_name}/`):

  {split}.jsonl    one JSON object per example:
                     {"video": "videos/x.mp4",   # or a directory of frames
                      "caption/string": [...], "example/video_id": "x", ...}
                   optional "segment_start"/"segment_end" (seconds) restrict
                   sampling to a clip, like ActivityNet's moments.
  info.json        optional: {"shard_count": N} (first_k_shards granularity)

Videos decode through OpenCV (cv2, in this image); a `video` field naming a
DIRECTORY is read as pre-extracted frames (sorted image files) with no cv2
dependency. Examples carry `episodic_images` — a list of JPEG-encoded
frames — which is exactly what the `video_decode` pp op consumes
(pp/proj/paligemma/video.py), mirroring how DMVR ships JPEG frames.

Frame sampling follows the DMVR contract: `num_frames` consecutive samples
at `stride` (default: spread evenly over the clip); `deterministic_fs=True`
starts at the first frame, otherwise the offset is drawn per (seed, epoch,
example) — deterministic given the stream position, so sample-exact resume
holds. Short clips yield fewer frames; the `video_replicate_img` pp op
tiles them up to `num_frames`.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

from big_vision_tpu.datasets import core

_IMG_EXTS = (".jpg", ".jpeg", ".png")


def _frame_indices(num_avail, num_frames, stride, rng):
  """DMVR-style sampling: consecutive at `stride`, random or first offset."""
  if num_avail <= 0:
    return np.zeros((0,), np.int64)
  if not stride:
    stride = max(1, num_avail // num_frames)
  span = (num_frames - 1) * stride + 1
  if num_avail >= span:
    offset = 0 if rng is None else int(rng.integers(0, num_avail - span + 1))
    return offset + np.arange(num_frames) * stride
  return np.arange(0, num_avail, stride)[:num_frames]


def _read_frame_dir(path, idx):
  files = sorted(f for f in os.listdir(path)
                 if f.lower().endswith(_IMG_EXTS))
  out = []
  for i in idx:
    with open(os.path.join(path, files[int(i)]), "rb") as f:
      out.append(f.read())
  return out


def _count_frames_dir(path):
  return sum(1 for f in os.listdir(path) if f.lower().endswith(_IMG_EXTS))


@functools.cache
def _cv2():
  try:
    import cv2  # pytype: disable=import-error
    return cv2
  except ImportError as e:
    raise ImportError(
        "bv:video needs OpenCV (cv2) to decode video files; pre-extract "
        "frames to directories to avoid the dependency") from e


def _read_video(path, idx, jpeg_quality):
  """Decodes the frames at `idx` from a video file, JPEG-encodes them."""
  cv2 = _cv2()
  cap = cv2.VideoCapture(path)
  if not cap.isOpened():
    raise IOError(f"cannot open video {path!r}")
  want = {int(i) for i in idx}
  got = {}
  pos = 0
  last = max(want) if want else -1
  while pos <= last:
    ok = cap.grab()
    if not ok:
      break
    if pos in want:
      ok, frame = cap.retrieve()
      if not ok:
        break
      # cv2 frames are BGR; imencode also expects BGR, so the JPEG bytes
      # round-trip to correct RGB in any standard decoder.
      ok, buf = cv2.imencode(
          ".jpg", frame, [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality])
      if not ok:
        raise IOError(f"JPEG encode failed for {path!r} frame {pos}")
      got[pos] = buf.tobytes()
    pos += 1
  cap.release()
  return [got[int(i)] for i in idx if int(i) in got]


def _video_meta(path):
  """(frame_count, fps) of a video file or frames directory."""
  if os.path.isdir(path):
    return _count_frames_dir(path), None
  cv2 = _cv2()
  cap = cv2.VideoCapture(path)
  try:
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or None
    return n, fps
  finally:
    cap.release()


class DataSource(core.DataSource):
  """DMVR-contract video reader over a jsonl-annotated video directory."""

  def __init__(self, dataset_name, *, split="train", data_dir=None,
               num_frames=8, stride=None, deterministic_fs=False,
               first_k_shards=None, jpeg_quality=90, **unused_kw):
    data_dir = data_dir or os.environ.get("BV_VIDEO_DIR")
    if not data_dir:
      raise ValueError(
          "bv:video needs data_dir= (or $BV_VIDEO_DIR) pointing at the "
          "directory holding <dataset_name>/<split>.jsonl")
    self.root = os.path.join(data_dir, dataset_name)
    fname = os.path.join(self.root, f"{split}.jsonl")
    with open(fname) as f:
      rows = [json.loads(line) for line in f]
    if first_k_shards:
      info = os.path.join(self.root, "info.json")
      shard_count = 10
      if os.path.exists(info):
        with open(info) as f:
          shard_count = json.load(f).get("shard_count", shard_count)
      bounds = np.linspace(0, len(rows), shard_count + 1).astype(int)
      rows = rows[:bounds[min(first_k_shards, shard_count)]]
    self.rows = rows
    self.num_frames = num_frames
    self.stride = stride
    self.deterministic_fs = deterministic_fs
    self.jpeg_quality = jpeg_quality
    self.total_examples = len(rows)
    self._start, self._stop = core.process_split(len(rows))

  def num_examples_per_process(self):
    return self._stop - self._start

  def _example(self, i, rng):
    ex = dict(self.rows[i])
    path = os.path.join(self.root, ex.pop("video"))
    num_avail, fps = _video_meta(path)
    first = 0
    # Optional clip restriction (seconds), e.g. ActivityNet moments.
    if fps and ex.get("segment_end") is not None:
      first = int(float(ex.get("segment_start", 0)) * fps)
      num_avail = min(num_avail, int(float(ex["segment_end"]) * fps) + 1)
      num_avail = max(num_avail - first, 0)
    idx = first + _frame_indices(num_avail, self.num_frames, self.stride,
                                 None if self.deterministic_fs else rng)
    if os.path.isdir(path):
      ex["episodic_images"] = _read_frame_dir(path, idx)
    else:
      ex["episodic_images"] = _read_video(path, idx, self.jpeg_quality)
    ex.setdefault("_id", np.int64(i))
    return ex

  def get_examples(self, *, ordered, seed=0, epoch=0):
    idx = np.arange(self._start, self._stop)
    if not ordered:
      rng = np.random.default_rng((seed, epoch))
      idx = rng.permutation(idx)
    for i in idx:
      frame_rng = np.random.default_rng((seed, epoch, int(i), 7))
      yield self._example(int(i), frame_rng)
