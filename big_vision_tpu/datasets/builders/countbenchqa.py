"""CountBenchQA builder (counting benchmark; one "huggingface" split).

Raw downloads (reference big_vision/datasets/countbenchqa/countbenchqa.py:21-22):
  https://huggingface.co/datasets/nielsr/countbench/.../train-00000-of-00001-*.parquet
  https://raw.githubusercontent.com/teaching-clip-to-count/.../CountBench.json
  countbench_paired_questions.json (ships with the reference repo)

Requires pyarrow OR a pre-exported directory of images + index.json; the
parquet read is gated so the module imports cleanly without pyarrow.
"""

import glob
import io

from big_vision_tpu.datasets.builders import base


@base.register("countbenchqa")
class CountBenchQa(base.Builder):
  SPLITS = ("huggingface",)

  def generate(self, split):
    del split
    import pandas as pd  # pandas + pyarrow needed for the HF parquet
    pq = glob.glob(self.path("train-*.parquet"))
    assert pq, f"no train-*.parquet under {self.raw_dir}"
    df = pd.read_parquet(pq[0])
    questions = self.json("countbench_paired_questions.json")
    if isinstance(questions, dict):
      questions = questions.get("question", questions)
    for idx, row in df.iterrows():
      if row["image"] is None:
        continue
      img = row["image"]["bytes"]
      from PIL import Image
      with Image.open(io.BytesIO(img)) as im:
        if im.mode != "RGB":  # filter the one bad (non-3D) image
          if len(im.getbands()) < 3:
            continue
      q = questions[idx] if not hasattr(questions, "iloc") else (
          questions.iloc[idx])
      yield {
          "image": img,
          "image_id": int(idx),
          "question": q if isinstance(q, str) else str(q),
          "text": row.get("text", ""),
          "image_url": row.get("image_url", ""),
          "number": int(row["number"]),
      }
