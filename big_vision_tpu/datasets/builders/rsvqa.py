"""RSVQA-LR / RSVQA-HR builders (remote-sensing VQA; .tif images).

Raw download (reference big_vision/datasets/rsvqa_lr/rsvqa_lr.py,
rsvqa_hr/rsvqa_hr.py): https://rsvqa.sylvainlobry.com/ ->
  {LR,USGS}_split_{train,val,test}_questions.json / _answers.json
  Images_LR/ or Data/ (HR) with <img_id>.tif

Count answers are binned into the reference's ranges; the "nonum"
configs drop count questions entirely. TIFs are transcoded to PNG bytes
(PIL) so the standard decode pp op reads them.
"""

import io

from big_vision_tpu.datasets.builders import base


def bin_answer(answer, question_type, hr=False):
  """Bins count answers into the reference's ranges (rsvqa_lr.py:178)."""
  if question_type == "count":
    count = int(answer)
    if count == 0:
      return "0"
    if hr:  # rsvqa_hr bins (reference rsvqa_hr.py)
      if count <= 10:
        return "between 1 and 10"
      if count <= 100:
        return "between 11 and 100"
      if count <= 1000:
        return "between 101 and 1000"
      return "more than 1000"
    if count <= 10:
      return "between 1 and 10"
    if count <= 100:
      return "between 11 and 100"
    if count <= 1000:
      return "between 101 and 1000"
    return "more than 1000"
  if question_type == "area":
    area = int(answer.replace("m2", ""))
    if area == 0:
      return "0m2"
    if area <= 10:
      return "between 1m2 and 10m2"
    if area <= 100:
      return "between 11m2 and 100m2"
    if area <= 1000:
      return "between 101m2 and 1000m2"
    return "more than 1000m2"
  return answer


class _Rsvqa(base.Builder):
  SPLITS = ("train", "val", "test")
  PREFIX = None     # "LR" or "USGS"
  IMAGES = None     # "Images_LR" or "Data"
  NONUM = False
  HR = False

  def generate(self, split):
    questions = self.json(
        f"{self.PREFIX}_split_{split}_questions.json")["questions"]
    answers = self.json(
        f"{self.PREFIX}_split_{split}_answers.json")["answers"]
    for q, a in zip(questions, answers):
      if not q["active"]:
        continue
      if self.NONUM and q["type"] == "count":
        continue
      assert q["id"] == a["question_id"], (q["id"], a["question_id"])
      filename = f"{q['img_id']}.tif"
      yield {
          "question_id": q["id"],
          "filename": filename,
          "image": _tif_to_png(self.path(self.IMAGES, filename)),
          "question": q["question"],
          "question_type": q["type"],
          "answers": [bin_answer(a["answer"], q["type"], hr=self.HR)],
          "raw_answers": [str(a["answer"])],
      }


def _tif_to_png(path):
  from PIL import Image
  buf = io.BytesIO()
  img = Image.open(path)
  if img.mode not in ("RGB", "L"):
    img = img.convert("RGB")
  img.save(buf, format="PNG")
  return buf.getvalue()


@base.register("rsvqa_lr/all")
class RsvqaLrAll(_Rsvqa):
  PREFIX, IMAGES = "LR", "Images_LR"


@base.register("rsvqa_lr/nonum")
class RsvqaLrNonum(_Rsvqa):
  PREFIX, IMAGES, NONUM = "LR", "Images_LR", True


@base.register("rsvqa_hr/all")
class RsvqaHrAll(_Rsvqa):
  PREFIX, IMAGES, HR = "USGS", "Data", True


@base.register("rsvqa_hr/nonum")
class RsvqaHrNonum(_Rsvqa):
  PREFIX, IMAGES, NONUM, HR = "USGS", "Data", True, True
