"""Project pp ops: uvim/givt/paligemma-extras/flaxformer/video."""

import io

import numpy as np
import pytest

from big_vision_tpu.pp import builder
import big_vision_tpu.pp.ops_general  # noqa: F401
import big_vision_tpu.pp.ops_image  # noqa: F401
import big_vision_tpu.pp.proj.givt.pp_ops  # noqa: F401
import big_vision_tpu.pp.proj.uvim.pp_ops  # noqa: F401
import big_vision_tpu.pp.proj.paligemma.widgetcap  # noqa: F401
import big_vision_tpu.pp.proj.paligemma.robustness  # noqa: F401
import big_vision_tpu.pp.proj.paligemma.sciqa_ops  # noqa: F401
import big_vision_tpu.pp.proj.paligemma.video  # noqa: F401
import big_vision_tpu.pp.proj.flaxformer.bert_ops  # noqa: F401
from big_vision_tpu.pp.proj.paligemma import segmentation


def run(spec, data, seed=0):
  # Full per-example execution (host ops + eager device ops).
  return builder.get_preprocess_fn(spec)(data, np.random.default_rng(seed))


def test_bin_nyu_depth():
  depth = np.asarray([[0.0, 5.0, 10.0, 20.0]], np.float32)[..., None]
  out = run("bin_nyu_depth(num_bins=256)", {"labels": depth})
  got = np.asarray(out["labels"])[0, :, 0]
  assert got[0] == 0 and got[1] == 127 and got[2] == 255 and got[3] == 255


def test_grayscale_and_nyu_ops():
  img = np.zeros((480, 640, 3), np.uint8)
  img[..., 0] = 200  # red only
  depth = np.ones((480, 640), np.float32)
  out = run("nyu_depth|rgb_to_grayscale_to_rgb|nyu_eval_crop",
            {"image": img, "depth": depth})
  assert out["image"].shape == (426, 560, 3)
  assert out["labels"].shape == (426, 560, 1)
  # All three channels equal after grayscale.
  assert (out["image"][..., 0] == out["image"][..., 1]).all()
  assert int(out["image"][0, 0, 0]) == int(0.2989 * 200)


def test_coco_panoptic_and_make_canonical():
  # Two objects: id 5 (label 1) left, id 9 (label 3) right.
  pan = np.zeros((8, 8, 3), np.uint8)
  pan[:, :4, 0] = 5
  pan[:, 4:, 0] = 9
  data = {"panoptic_image": pan,
          "panoptic_objects": {"id": np.asarray([9, 5]),
                               "label": np.asarray([3, 1])}}
  out = run("coco_panoptic", data)
  assert out["semantics"].shape == (8, 8, 1)
  assert out["semantics"][0, 0, 0] == 2  # label 1 + 1
  assert out["semantics"][0, 7, 0] == 4  # label 3 + 1
  # Instance ids follow annotation order: id 9 -> 1, id 5 -> 2.
  assert out["instances"][0, 7, 0] == 1
  assert out["instances"][0, 0, 0] == 2

  # make_canonical renumbers left-to-right (y-major sort): left gets 2.
  lab = np.concatenate([out["semantics"], out["instances"]], -1)
  out2 = run("make_canonical", {"labels": lab})
  inst = out2["labels"][..., -1]
  assert inst[0, 0] == 1  # leftmost instance renumbered first
  assert inst[0, 7] == 2


def test_inception_box_crop_randu_fliplr():
  img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
  out = run("randu('fliplr')|inception_box|crop_box", {"image": img})
  assert 0.0 <= out["fliplr"] < 1.0
  assert out["image"].ndim == 3 and out["image"].shape[-1] == 3
  assert out["image"].shape[0] >= 1

  flipped = run("det_fliplr", {"image": img, "fliplr": np.float32(0.9)})
  np.testing.assert_array_equal(flipped["image"], img[:, ::-1])
  same = run("det_fliplr", {"image": img, "fliplr": np.float32(0.1)})
  np.testing.assert_array_equal(same["image"], img)


def test_strong_hash_stable():
  a = run("strong_hash", {"tfds_id": "example-1"})
  b = run("strong_hash", {"tfds_id": "example-1"}, seed=7)
  c = run("strong_hash", {"tfds_id": "example-2"})
  assert a["tfds_id"] == b["tfds_id"] != c["tfds_id"]
  assert np.asarray(a["tfds_id"]).dtype == np.int64


def test_draw_bbox():
  img = np.zeros((10, 10, 3), np.uint8)
  out = run("draw_bbox", {"image": img,
                          "bbox": np.asarray([0.2, 0.2, 0.8, 0.8])})
  got = out["image"]
  # Truncation semantics (TF kernel): row = int(0.2 * 9) = 1.
  assert (got[1, 1:8] == [255, 0, 0]).all()  # top edge red
  assert (got[0, :] == 0).all()  # outside untouched


def test_resize_r_and_random_jpeg():
  rs = np.random.RandomState(0)
  img = rs.randint(0, 255, (32, 32, 3), np.uint8)
  out = run("resize_r(16)", {"image": img})
  assert out["image"].shape == (16, 16, 3)
  assert out["image"].dtype == np.uint8

  out_jpg = run("random_jpeg(1.0)", {"image": img})
  assert out_jpg["image"].shape == img.shape
  assert not np.array_equal(out_jpg["image"], img)  # lossy
  out_nojpg = run("random_jpeg(0.0)", {"image": img})
  np.testing.assert_array_equal(out_nojpg["image"], img)


def test_sciqa_shuffle():
  data = {"choices": np.asarray(["apple", "banana", "pear"]),
          "answer": np.asarray(2)}
  out = run("sci_qa_choices_shuffle", data)
  assert out["indexed_choices"].count("(") == 3
  letter = out["indexed_answer"]
  # The answer letter must point at "pear" in the shuffled string.
  idx = "ABC".index(letter)
  entry = out["indexed_choices"].split(", ")[idx]
  assert entry == f"({letter}) pear"


def test_video_ops():
  from PIL import Image
  frames = []
  for i in range(2):
    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), i * 100, np.uint8)).save(
        buf, format="JPEG")
    frames.append(buf.getvalue())
  out = run("video_decode(4)|video_replicate_img(3, 5)",
            {"episodic_images": frames})
  assert out["image"].shape == (5, 4, 4, 3)
  assert -1.0 <= out["image"].min() and out["image"].max() <= 1.0

  out2 = run("video_choice(inkey='x', outkey='y')",
             {"x": np.asarray([5, 6, 7])})
  assert out2["y"] in (5, 6, 7)
  out3 = run("video_choice(empty_fallback=-1, inkey='x', outkey='y')",
             {"x": np.asarray([], np.int32)})
  assert out3["y"] == -1

  out4 = run("stack_images(inkeys=('a', 'b'))",
             {"a": np.zeros((2, 2, 3)), "b": np.ones((2, 2, 3))})
  assert np.asarray(out4["image"]).shape == (2, 2, 2, 3)


def test_bert_tokenize(tmp_path):
  vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world"]
  vp = tmp_path / "vocab.txt"
  vp.write_text("\n".join(vocab))
  out = run(f"bert_tokenize('{vp}', 6, inkey='texts')",
            {"texts": "hello world hello"})
  got = out["labels"]
  assert got.shape == (6,) and got.dtype == np.int32
  assert got[0] == 2  # [CLS]
  assert list(got[1:4]) == [4, 5, 4]
  assert list(got[4:]) == [0, 0]


def _fake_seg_ckpt(rs, emb_dim=16):
  """Random checkpoint with the arXiv:2301.02229 encoder layout."""
  ck = {}
  chans = [1, 16, 32, 64, 128]
  for n in range(4):
    ck[f"encoder.{2*n}.weight"] = rs.randn(
        chans[n + 1], chans[n], 3, 3).astype(np.float32) * 0.1
    ck[f"encoder.{2*n}.bias"] = np.zeros(chans[n + 1], np.float32)
  for n in (8, 9):
    for i, (kh, cout) in enumerate([(3, 128), (3, 128), (1, 128)]):
      ck[f"encoder.{n}.net.{2*i}.weight"] = rs.randn(
          cout, 128, kh, kh).astype(np.float32) * 0.1
      ck[f"encoder.{n}.net.{2*i}.bias"] = np.zeros(cout, np.float32)
  ck["encoder.10.weight"] = rs.randn(emb_dim, 128, 1, 1).astype(
      np.float32) * 0.1
  ck["encoder.10.bias"] = np.zeros(emb_dim, np.float32)
  ck["_vq_vae._embedding"] = rs.randn(128, emb_dim).astype(np.float32)
  return ck


def test_refcoco_mask2str(tmp_path):
  rs = np.random.RandomState(0)
  ckpt_path = tmp_path / "vae.npz"
  np.savez(ckpt_path, **_fake_seg_ckpt(rs))

  mask = np.zeros((100, 100, 3), np.uint8)
  mask[20:80, 30:90] = 255
  data = {
      "objects/mask": mask,
      "objects/refs/sentence": "the big square",
      "objects/bbox": np.asarray([0.2, 0.3, 0.8, 0.9], np.float32),
  }
  out = run(f"refcoco_mask2str(model='{ckpt_path}')", data)
  assert out["prefix"] == "the big square"
  suffix = out["suffix"]
  assert suffix.count("<loc") == 4 and suffix.count("<seg") == 16
  # Box tokens encode the bbox bins.
  assert suffix.startswith(
      "<loc%04d><loc%04d>" % (round(0.2 * 1023), round(0.3 * 1023)))
