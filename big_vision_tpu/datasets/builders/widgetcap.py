"""Widget Captioning builder (RICO UI widgets + bounding boxes).

Raw download (reference big_vision/datasets/widgetcap/widgetcap.py):
  https://github.com/google-research-datasets/widget-caption ->
  {train,dev,test}.txt + widget_captions.csv
  RICO screens+view hierarchies: raw_dir/rico/<screenId>.{jpg,json}

The widget's bounding box is resolved by walking the view hierarchy with
the node id's child indices and normalizing by the RICO canvas height
(reference widgetcap.py:117-127). Boxes ride as relative
[ymin, xmin, ymax, xmax] floats under "bbox/".
"""

import csv

from big_vision_tpu.datasets.builders import base

_RICO_CANVAS_Y = 2560
_SPLIT_FILE = {"train": "train.txt", "dev": "dev.txt", "test": "test.txt"}


@base.register("widgetcap")
class WidgetCap(base.Builder):
  SPLITS = ("train", "dev", "test")

  def _node_box(self, screen_id, node_id, width, height):
    view = self.json("rico", f"{screen_id}.json")
    node = view["activity"]["root"]
    for index in (int(i) for i in node_id.split(".")[1:]):
      node = node["children"][index]
    xmin, ymin, xmax, ymax = (x * height / _RICO_CANVAS_Y
                              for x in node["bounds"])
    return (ymin / height, xmin / width, ymax / height, xmax / width)

  def generate(self, split):
    with open(self.path(_SPLIT_FILE[split])) as f:
      split_ids = {line.strip() for line in f if line.strip()}
    from PIL import Image
    sizes = {}
    with open(self.path("widget_captions.csv")) as f:
      for row in csv.DictReader(f):
        screen_id = row["screenId"]
        if screen_id not in split_ids:
          continue
        if screen_id not in sizes:
          with Image.open(self.path("rico", f"{screen_id}.jpg")) as im:
            sizes[screen_id] = im.size
        width, height = sizes[screen_id]
        ymin, xmin, ymax, xmax = self._node_box(
            screen_id, row["nodeId"], width, height)
        yield {
            "image/id": f"{screen_id}_{row['nodeId']}",
            "image/filename": f"{screen_id}.jpg",
            "image": base.File(self.path("rico", f"{screen_id}.jpg")),
            "texts": row["captions"].split("|"),
            "bbox/ymin": ymin, "bbox/xmin": xmin,
            "bbox/ymax": ymax, "bbox/xmax": xmax,
        }
