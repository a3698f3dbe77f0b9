"""AI2D builder (diagram multiple-choice QA).

Raw download (reference big_vision/datasets/ai2d/ai2d.py):
  https://allenai.org/data/diagrams -> ai2d/{questions,annotations,images}
  + ai2d_test_ids.csv

abcLabel questions reference letters drawn over the diagram text; like
the reference (ai2d.py:184-209) we white-out each annotated text box and
draw its replacement letter, auto-shrinking the font to fit.
"""

import glob
import io
import os

from big_vision_tpu.datasets.builders import base


def _draw_text(path, text_annotations):
  from PIL import Image, ImageDraw, ImageFont
  image = Image.open(path).convert("RGB")
  draw = ImageDraw.Draw(image)
  for ann in text_annotations.values():
    (x0, y0), (x1, y1) = (tuple(p) for p in ann["rectangle"])
    text = ann["replacementText"]
    draw.rectangle([(x0, y0), (x1, y1)], fill="white")
    size = None
    for font_size in range(40, 4, -2):
      try:
        font = ImageFont.load_default(size=font_size)
      except TypeError:  # older PIL: fixed-size default font
        font = ImageFont.load_default()
        size = font.getbbox(text)
        break
      size = font.getbbox(text)
      if size[2] <= x1 - x0 and size[3] <= y1 - y0:
        break
    delta = max(0, (x1 - x0 - size[2]) // 2)
    draw.text((x0 + delta, y0), text, fill="black", font=font)
  buf = io.BytesIO()
  image.save(buf, format="PNG")
  return buf.getvalue()


@base.register("ai2d")
class Ai2d(base.Builder):
  SPLITS = ("train", "test")

  def generate(self, split):
    with open(self.path("ai2d_test_ids.csv")) as f:
      test_ids = {line.strip() for line in f if line.strip()}
    for qpath in sorted(glob.glob(self.path("ai2d", "questions",
                                            "*.json"))):
      basename = os.path.basename(qpath)
      image_id = basename.split(".")[0]
      if (image_id in test_ids) != (split == "test"):
        continue
      with open(qpath) as f:
        import json
        qjson = json.load(f)
      with open(self.path("ai2d", "annotations", basename)) as f:
        text_ann = json.load(f)
      for question, q in qjson["questions"].items():
        label = int(q["correctAnswer"])
        choices = q["answerTexts"]
        img_path = self.path("ai2d", "images", qjson["imageName"])
        image = (_draw_text(img_path, text_ann["text"])
                 if q["abcLabel"] else base.File(img_path))
        yield {
            "id": q["questionId"],
            "question": question,
            "label": label,
            "answer": choices[label],
            "possible_answers": list(choices),
            "correct_answer_idx": label,
            "abc_label": bool(q["abcLabel"]),
            "image_name": qjson["imageName"],
            "image": image,
        }
