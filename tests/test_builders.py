"""Dataset builders: split parsing, raw->built conversion, e2e training.

Raw fixtures mimic the public download layouts the builders document
(tiny PIL-generated JPEGs + json annotation files), so the tests verify
the same read path a real conversion uses.
"""

import io
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from big_vision_tpu.datasets import built, core, splits
from big_vision_tpu.datasets import builders

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_split_parse():
  assert splits.parse("train") == [("train", None, None)]
  assert splits.parse("train+restval") == [
      ("train", None, None), ("restval", None, None)]
  assert splits.parse("train + validation[:-10240]") == [
      ("train", None, None), ("validation", None, "-10240")]
  assert splits.parse("train[:98%]")[0] == ("train", None, "98%")
  assert splits.parse("test_zs_de") == [("test_zs_de", None, None)]


def test_split_materialize():
  assert splits.materialize(("t", None, None), 100) == ("t", 0, 100)
  assert splits.materialize(("t", None, "-10"), 100) == ("t", 0, 90)
  assert splits.materialize(("t", "-10", None), 100) == ("t", 90, 100)
  assert splits.materialize(("t", None, "98%"), 100) == ("t", 0, 98)
  assert splits.materialize(("t", "2%", "4%"), 1000) == ("t", 20, 40)
  # Oversized negative bound clamps to empty, not error.
  assert splits.materialize(("t", None, "-10240"), 7) == ("t", 0, 0)


def _jpeg(color, size=(24, 20)):
  from PIL import Image
  buf = io.BytesIO()
  Image.new("RGB", size, color).save(buf, format="JPEG")
  return buf.getvalue()


def _write_jpeg(path, color):
  os.makedirs(os.path.dirname(path), exist_ok=True)
  with open(path, "wb") as f:
    f.write(_jpeg(color))


def make_raw_vqa(raw):
  """Tiny raw VQAv2 layout: 2 train images/3 questions, 1 val/2 q."""
  for split, n_img, n_q in [("train2014", 2, 3), ("val2014", 1, 2)]:
    for i in range(n_img):
      _write_jpeg(os.path.join(
          raw, split, f"COCO_{split}_{i:012d}.jpg"), (10 * i, 100, 50))
  for tag, split, n_q in [("train2014", "train2014", 3),
                          ("val2014", "val2014", 2)]:
    qs = [{"image_id": i % 2 if "train" in split else 0,
           "question": f"what is {i}?", "question_id": 100 + i}
          for i in range(n_q)]
    with open(os.path.join(
        raw, f"v2_OpenEnded_mscoco_{tag}_questions.json"), "w") as f:
      json.dump({"questions": qs}, f)
    anns = [{"question_id": 100 + i, "image_id": q["image_id"],
             "question_type": "what", "answer_type": "other",
             "multiple_choice_answer": "thing",
             "answers": [{"answer": "thing", "answer_confidence": "yes"}
                         for _ in range(10)]}
            for i, q in enumerate(qs)]
    with open(os.path.join(
        raw, f"v2_mscoco_{tag}_annotations.json"), "w") as f:
      json.dump({"annotations": anns}, f)


def test_build_and_read_vqa(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  os.makedirs(raw)
  make_raw_vqa(raw)
  ds_dir = builders.build("vqa", raw, out_dir=out,
                          splits=["train", "validation"])
  assert os.path.isfile(os.path.join(ds_dir, "info.json"))

  # Union + slice split expression through the public get() entry point.
  src = core.get("vqa", split="train + validation[:-1]", data_dir=out)
  assert src.total_examples == 3 + 1
  exs = list(src.get_examples(ordered=True))
  assert len(exs) == 4
  ex = exs[0]
  assert ex["question_text"] == "what is 0?"
  assert ex["answers"] == ["thing"] * 10
  assert isinstance(ex["image"], bytes) and ex["image"][:2] == b"\xff\xd8"

  # built.exists gates the core.get dispatch.
  assert built.exists("vqa", out)
  assert not built.exists("nonexistent", out)


def test_build_chartqa(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  for split in ("train", "val"):
    _write_jpeg(os.path.join(raw, split, "png", "c0.png"), (0, 0, 200))
    with open(os.path.join(raw, split, f"{split}_human.json"), "w") as f:
      json.dump([{"imgname": "c0.png", "query": "max?", "label": "42"}],
                f)
  builders.build("chartqa/human", raw, out_dir=out,
                 splits=["train", "val"])
  src = core.get("chartqa/human", split="train+val", data_dir=out)
  exs = list(src.get_examples(ordered=True))
  assert len(exs) == 2 and exs[0]["answer"] == "42"


def test_build_gqa(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  _write_jpeg(os.path.join(raw, "images", "n1.jpg"), (9, 9, 9))
  with open(os.path.join(raw, "val_balanced_questions.json"), "w") as f:
    json.dump({"q1": {"imageId": "n1", "question": "color?",
                      "answer": "gray", "fullAnswer": "It is gray.",
                      "isBalanced": True}}, f)
  builders.build("gqa", raw, out_dir=out, splits=["val_balanced"])
  src = core.get("gqa", split="val_balanced", data_dir=out)
  (ex,) = list(src.get_examples(ordered=True))
  assert ex["answer"] == "gray" and ex["full_answer"] == "It is gray."


def test_build_coco_captions(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  images = []
  for i, split in enumerate(["train", "restval", "val", "test"]):
    fname = f"img{i}.jpg"
    _write_jpeg(os.path.join(raw, "train2014", fname), (i, i, i))
    images.append({
        "cocoid": i, "split": split, "filename": fname,
        "filepath": "train2014",
        "sentences": [{"sentid": 10 * i + j, "raw": f"cap {i}.{j}"}
                      for j in range(2)]})
  with open(os.path.join(raw, "dataset_coco.json"), "w") as f:
    json.dump({"images": images}, f)
  builders.build("coco_captions", raw, out_dir=out)
  src = core.get("coco_captions", split="train+restval", data_dir=out)
  exs = list(src.get_examples(ordered=True))
  assert len(exs) == 2
  assert exs[0]["captions"]["text"] == ["cap 0.0", "cap 0.1"]


def test_refcoco_build_and_masks(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  _write_jpeg(os.path.join(raw, "train2017", "i1.jpg"), (1, 2, 3))
  os.makedirs(os.path.join(raw, "refcoco"))
  refs = [{"image_id": 1, "ann_id": 11, "split": "val",
           "sentences": [{"sent_id": 0, "sent": "the left box"}]}]
  with open(os.path.join(raw, "refcoco", "refs(unc).p"), "wb") as f:
    pickle.dump(refs, f)
  inst = {
      "images": [{"id": 1, "file_name": "i1.jpg", "height": 20,
                  "width": 24}],
      "categories": [{"id": 5, "name": "box", "supercategory": "thing"}],
      "annotations": [{"id": 11, "image_id": 1, "category_id": 5,
                       "iscrowd": 0, "area": 25.0,
                       "bbox": [2, 4, 6, 5],
                       "segmentation": [[2, 4, 8, 4, 8, 9, 2, 9]]}],
  }
  with open(os.path.join(raw, "instances.json"), "w") as f:
    json.dump(inst, f)
  builders.build("ref_coco_bv/refcoco_unc", raw, out_dir=out,
                 splits=["validation"])
  src = core.get("ref_coco_bv/refcoco_unc:1.4.0", split="validation",
                 data_dir=out)
  (ex,) = list(src.get_examples(ordered=True))
  assert ex["objects/refs/sentence"] == [["the left box"]]
  from PIL import Image
  mask = np.array(Image.open(io.BytesIO(ex["objects/mask"][0])))
  assert mask.shape == (20, 24)
  assert mask[6, 5] and not mask[0, 0]  # inside vs outside the polygon
  np.testing.assert_allclose(
      ex["objects/bbox"][0], [4 / 20, 2 / 24, 9 / 20, 8 / 24])


def test_rle_rasterize_column_major():
  from big_vision_tpu.datasets.builders import refcoco as rc
  # 3x2 image, column-major runs: [1 off, 2 on, 3 off] ->
  # pixels (1,0),(2,0) set.
  mask = rc._rasterize({"counts": [1, 2, 3], "size": [3, 2]}, 3, 2)
  expected = np.zeros((3, 2), bool)
  expected[1, 0] = expected[2, 0] = True
  np.testing.assert_array_equal(mask, expected)


def test_registry_covers_transfer_datasets():
  names = set(builders.names())
  for needed in ["vqa", "okvqa", "aokvqa", "gqa", "xgqa", "textvqa",
                 "chartqa/human", "chartqa/augmented", "coco_captions",
                 "coco35l", "textcaps", "science_qa", "tallyqa", "ai2d",
                 "docvqa", "infovqa", "stvqa", "vizwizvqa",
                 "pope/random", "pope/popular", "pope/adversarial",
                 "scicap/first_sentence_subfig_no", "screen2words",
                 "widgetcap", "nocaps", "rsvqa_lr/nonum",
                 "rsvqa_hr/nonum", "countbenchqa", "xm3600",
                 "ref_coco_bv/refcocox_combined"]:
    assert needed in names, f"missing builder: {needed}"


@pytest.mark.slow
def test_vqa_transfer_trains_e2e_on_built_dataset(tmp_path):
  """The VERDICT contract: raw fixture -> build -> transfer-style train."""
  raw = str(tmp_path / "raw")
  data = str(tmp_path / "data")
  wd = str(tmp_path / "wd")
  os.makedirs(raw)
  make_raw_vqa(raw)
  builders.build("vqa", raw, out_dir=data,
                 splits=["train", "validation"])

  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO, "BV_DATA_DIR": data}
  r = subprocess.run(
      [sys.executable, "-m", "big_vision_tpu.trainers.proj.paligemma.train",
       "--config",
       "big_vision_tpu/configs/proj/paligemma/transfers/smoke_built.py",
       "--workdir", wd],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
  assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
  with open(os.path.join(wd, "big_vision_metrics.txt")) as f:
    rows = [json.loads(line) for line in f]
  assert any("training_loss" in row for row in rows)
  # The vqav2-style eval over the built validation split produced a metric.
  assert any(any("acc" in k for k in row) for row in rows), rows


def test_build_textcaps_groups_captions(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  _write_jpeg(os.path.join(raw, "train_images", "im1.jpg"), (5, 5, 5))
  data = [{"image_id": "im1", "image_name": "im1",
           "caption_str": f"caption {j}"} for j in range(3)]
  with open(os.path.join(raw, "TextCaps_0.1_train.json"), "w") as f:
    json.dump({"data": data}, f)
  builders.build("textcaps", raw, out_dir=out, splits=["train"])
  (ex,) = list(core.get("textcaps", split="train",
                        data_dir=out).get_examples(ordered=True))
  assert ex["texts"] == ["caption 0", "caption 1", "caption 2"]


def test_build_science_qa_drops_imageless(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  _write_jpeg(os.path.join(raw, "val", "q1", "image.png"), (1, 2, 3))
  problems = {
      "q1": {"split": "val", "image": "image.png", "question": "why?",
             "choices": ["a", "b"], "answer": 1, "hint": "",
             "lecture": "", "solution": ""},
      "q2": {"split": "val", "image": None, "question": "no image",
             "choices": ["a"], "answer": 0},
  }
  with open(os.path.join(raw, "problems.json"), "w") as f:
    json.dump(problems, f)
  builders.build("science_qa", raw, out_dir=out, splits=["val"])
  exs = list(core.get("science_qa", split="val",
                      data_dir=out).get_examples(ordered=True))
  assert len(exs) == 1 and exs[0]["answer"] == "B"


def test_build_pope_thing_extraction(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  _write_jpeg(os.path.join(raw, "images", "val2014",
                           "COCO_val2014_0.jpg"), (0, 1, 2))
  rows = [{"image": "COCO_val2014_0.jpg",
           "text": "Is there a snowboard in the image?", "label": "no"}]
  os.makedirs(os.path.join(raw, "pope"))
  with open(os.path.join(raw, "pope", "coco_pope_random.json"), "w") as f:
    f.write("\n".join(json.dumps(r) for r in rows))
  builders.build("pope/random", raw, out_dir=out)
  (ex,) = list(core.get("pope/random", split="test",
                        data_dir=out).get_examples(ordered=True))
  assert ex["thing"] == "snowboard" and ex["answer"] == "no"


def test_build_okvqa(tmp_path):
  raw, out = str(tmp_path / "raw"), str(tmp_path / "data")
  _write_jpeg(os.path.join(raw, "val2014",
                           "COCO_val2014_000000000007.jpg"), (7, 7, 7))
  qs = {"questions": [{"question_id": 70, "image_id": 7,
                       "question": "what brand?"}]}
  anns = {"annotations": [{
      "question_id": 70, "image_id": 7, "answer_type": "other",
      "multiple_choice_answer": "acme",
      "answers": [{"answer": "acme", "raw_answer": "Acme"}] * 10}]}
  with open(os.path.join(
      raw, "OpenEnded_mscoco_val2014_questions.json"), "w") as f:
    json.dump(qs, f)
  with open(os.path.join(raw, "mscoco_val2014_annotations.json"),
            "w") as f:
    json.dump(anns, f)
  builders.build("okvqa", raw, out_dir=out, splits=["val"])
  (ex,) = list(core.get("okvqa", split="val",
                        data_dir=out).get_examples(ordered=True))
  assert ex["answers"] == ["acme"] * 10 and ex["question_id"] == 70
