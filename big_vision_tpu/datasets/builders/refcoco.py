"""RefCOCO family builders (referring-expression segmentation).

Raw layout (reference big_vision/datasets/refcoco/refcoco.py):
  raw_dir/instances.json          (COCO-2014 instances, from refer's zips)
  raw_dir/{refcoco,refcoco+,refcocog}/refs(<partition>).p
  raw_dir/train2017/<file_name>   (COCO images)

Registered as ref_coco_bv/{refcoco_unc,refcocoplus_unc,refcocog_umd,
refcocox_combined} — the names the refcoco_seg transfer config uses.
Splits use "validation" like tfds; refcocox_combined merges all three
partitions, excluding every val/test image from train (reference
refcoco.py:345-366).

Masks are rasterized without pycocotools: polygon segmentations via PIL
ImageDraw, crowd (uncompressed RLE) via numpy; each rides as a PNG.
Examples carry flat parallel per-object lists ("objects/mask",
"objects/bbox", "objects/refs/sentence") which is the layout the config's
`choice_no_replacement(key=[...])` pp consumes.
"""

import collections
import io
import pickle

from big_vision_tpu.datasets.builders import base


def _rasterize(segmentation, height, width):
  import numpy as np
  from PIL import Image, ImageDraw
  if isinstance(segmentation, dict):  # uncompressed RLE (iscrowd)
    counts = segmentation["counts"]
    assert isinstance(counts, (list, tuple)), "compressed RLE unsupported"
    flat = np.zeros(height * width, dtype=bool)
    pos, val = 0, False
    for c in counts:
      if val:
        flat[pos:pos + c] = True
      pos += c
      val = not val
    return flat.reshape(width, height).T  # COCO RLE is column-major
  img = Image.new("1", (width, height), 0)
  draw = ImageDraw.Draw(img)
  for poly in segmentation:
    draw.polygon([tuple(poly[i:i + 2]) for i in range(0, len(poly), 2)],
                 fill=1)
  import numpy as np
  return np.array(img, dtype=bool)


def _mask_png(mask):
  from PIL import Image
  buf = io.BytesIO()
  Image.fromarray(mask).save(buf, "PNG")
  return buf.getvalue()


class _RefCoco(base.Builder):
  # (dataset, partition) pairs merged into this variant.
  SOURCES = ()
  SPLITS = ("train", "validation", "test")

  def _refs(self, dataset, partition):
    with open(self.path(dataset, f"refs({partition}).p"), "rb") as f:
      return pickle.load(f)

  def generate(self, split):
    split = {"validation": "val"}.get(split, split)
    refs = []
    for dataset, partition in self.SOURCES:
      refs.extend(self._refs(dataset, partition))
    splits = (("test", "testA", "testB") if split == "test" else (split,))
    exclude = set()
    if split == "train" and len(self.SOURCES) > 1:
      exclude = {r["image_id"] for r in refs if r["split"] != "train"}
    refs = [r for r in refs
            if r["split"] in splits and r["image_id"] not in exclude]
    img_ids = {r["image_id"] for r in refs}
    ann_to_refs = collections.defaultdict(list)
    for r in refs:
      for sent in r["sentences"]:
        ann_to_refs[r["ann_id"]].append(sent["sent"])

    coco = self.json("instances.json")
    images = {im["id"]: im for im in coco["images"]}
    cats = {c["id"]: c for c in coco["categories"]}
    anns_by_img = collections.defaultdict(list)
    for ann in coco["annotations"]:
      anns_by_img[ann["image_id"]].append(ann)

    for img_id in sorted(img_ids):
      img = images[img_id]
      h, w = img["height"], img["width"]
      masks, bboxes, sentences, categories, ids = [], [], [], [], []
      for ann in anns_by_img[img_id]:
        sents = ann_to_refs.get(ann["id"])
        if not sents:
          continue
        x, y, bw, bh = ann["bbox"]
        masks.append(_mask_png(_rasterize(ann["segmentation"], h, w)))
        bboxes.append([y / h, x / w, (y + bh) / h, (x + bw) / w])
        sentences.append(sents)
        categories.append(cats[ann["category_id"]]["name"])
        ids.append(ann["id"])
      if not masks:
        continue
      yield {
          "id": img_id,
          "image": base.File(self.path("train2017", img["file_name"])),
          "height": h, "width": w,
          "file_name": img["file_name"],
          "objects/id": ids,
          "objects/mask": masks,
          "objects/bbox": bboxes,
          "objects/refs/sentence": sentences,
          "objects/category": categories,
      }


@base.register("ref_coco_bv/refcoco_unc")
class RefCocoUnc(_RefCoco):
  SOURCES = (("refcoco", "unc"),)
  SPLITS = ("train", "validation", "testA", "testB")


@base.register("ref_coco_bv/refcocoplus_unc")
class RefCocoPlusUnc(_RefCoco):
  SOURCES = (("refcoco+", "unc"),)
  SPLITS = ("train", "validation", "testA", "testB")


@base.register("ref_coco_bv/refcocog_umd")
class RefCocogUmd(_RefCoco):
  SOURCES = (("refcocog", "umd"),)


@base.register("ref_coco_bv/refcocox_combined")
class RefCocoXCombined(_RefCoco):
  SOURCES = (("refcocog", "umd"), ("refcoco", "unc"), ("refcoco+", "unc"))
