"""Screen2Words builder (RICO UI screen summarization).

Raw download (reference big_vision/datasets/screen2words/screen2words.py):
  https://github.com/google-research/google-research/tree/master/screen2words
  -> split/{train,dev,test}_screens.txt + screen_summaries.csv
  RICO screens: https://interactionmining.org/rico -> rico/<id>.jpg
arranged as raw_dir/screen2words/... and raw_dir/rico/...
"""

import collections
import csv

from big_vision_tpu.datasets.builders import base


@base.register("screen2words")
class Screen2Words(base.Builder):
  SPLITS = ("train", "dev", "test")

  def generate(self, split):
    with open(self.path("screen2words", "split",
                        f"{split}_screens.txt")) as f:
      split_ids = [int(line.strip()) for line in f if line.strip()]
    summaries = collections.defaultdict(list)
    with open(self.path("screen2words", "screen_summaries.csv")) as f:
      for entry in csv.DictReader(f):
        summaries[int(entry["screenId"])].append(entry["summary"])
    for image_id in split_ids:
      yield {
          "image/id": image_id,
          "image/filename": f"{image_id}.jpg",
          "image": base.File(self.path("rico", f"{image_id}.jpg")),
          "summary": summaries[image_id],
      }
