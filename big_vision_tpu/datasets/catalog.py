"""Catalog of the VQA/captioning datasets the transfer configs expect.

These datasets now have EXECUTABLE native converters: `datasets/builders/`
turns the same publicly downloadable raw files the reference's tfds
GeneratorBasedBuilders consume (reference big_vision/datasets/<name>/)
into the TF-free built-dataset layout `datasets/built.py` serves — run
`python -m big_vision_tpu.tools.build_dataset --dataset=<name>
--raw_dir=...`. This catalog remains as the schema reference: every entry
lists the example features the pp chains/evaluators consume, which is
also the contract a hand-rolled jsonl export must meet.

Each entry: name -> (features the pp/evaluators consume, splits, source).
"""

CATALOG = {
    # --- VQA ---
    "vqa": (("image", "question_text", "answers", "answer_type",
             "question_type", "question_id"),
            ("train", "validation"), "visualqa.org (VQAv2)"),
    "okvqa": (("image", "question", "answers", "question_id"),
              ("train", "val"), "okvqa.allenai.org"),
    "aokvqa": (("image", "question", "direct_answers",
                "multiple_choice_possible_answers",
                "multiple_choice_correct_idx", "question_id"),
               ("train", "val", "test"), "allenai.org/project/a-okvqa"),
    "gqa": (("image", "question", "answer", "example_id"),
            ("train_balanced", "val_balanced", "testdev_balanced"),
            "cs.stanford.edu/people/dorarad/gqa"),
    "xgqa": (("image", "question", "answer", "example_id"),
             tuple(f"test_zs_{l}" for l in
                   ("bn", "de", "en", "id", "ko", "pt", "ru", "zh")),
             "github.com/adapter-hub/xGQA"),
    "ocrvqa_id": (("image", "question", "answer", "int_id"),
                  ("train", "val", "test"), "ocr-vqa.github.io"),
    "textvqa": (("image", "question", "answers", "question_id"),
                ("train", "val", "test"), "textvqa.org"),
    "docvqa": (("image", "question", "answers", "question_id"),
               ("train", "val", "test"), "docvqa.org"),
    "infovqa": (("image", "question", "answers", "question_id"),
                ("train", "val", "test"), "docvqa.org (InfographicVQA)"),
    "stvqa": (("image", "question", "answers", "question_id"),
              ("train", "val", "test"), "rrc.cvc.uab.es ST-VQA"),
    "vizwizvqa": (("image", "question", "answers", "question_id"),
                  ("train", "val", "test"), "vizwiz.org"),
    "chartqa/human": (("image", "question", "answer", "question_id"),
                      ("train", "val", "test"),
                      "github.com/vis-nlp/ChartQA"),
    "chartqa/augmented": (("image", "question", "answer", "question_id"),
                          ("train", "val", "test"),
                          "github.com/vis-nlp/ChartQA"),
    "science_qa": (("image", "question", "choices", "answer", "hint",
                    "lecture", "solution", "question_id"),
                   ("train", "val", "test"), "scienceqa.github.io"),
    "ai2d": (("image", "question", "possible_answers",
              "correct_answer_idx", "question_id"),
             ("train", "test"), "allenai.org/data/diagrams"),
    "tallyqa": (("image", "question", "answer", "issimple"),
                ("train", "test"), "github.com/manoja328/TallyQA"),
    "countbenchqa": (("image", "question", "number"),
                     ("huggingface",),
                     "huggingface.co/datasets/nielsr/countbench"),
    "pope/random": (("image", "question", "answer", "question_id"),
                    ("test",), "github.com/RUCAIBox/POPE"),
    "pope/popular": (("image", "question", "answer", "question_id"),
                     ("test",), "github.com/RUCAIBox/POPE"),
    "pope/adversarial": (("image", "question", "answer", "question_id"),
                         ("test",), "github.com/RUCAIBox/POPE"),
    "rsvqa_lr/nonum": (("image", "question", "answers", "question_id",
                        "question_type"),
                       ("train", "val", "test"), "rsvqa.sylvainlobry.com"),
    "rsvqa_hr/nonum": (("image", "question", "answers", "question_id",
                        "question_type"),
                       ("train", "val", "test", "test_phili"),
                       "rsvqa.sylvainlobry.com"),
    "nlvr2": (("image_left", "image_right", "sentence", "label"),
              ("train", "dev", "test"), "lil.nlp.cornell.edu/nlvr"),
    # --- Captioning ---
    "coco_captions": (("image", "captions/text", "image/id"),
                      ("train", "val", "restval"), "cocodataset.org"),
    "nocaps": (("image", "texts", "image/id"),
               ("val", "test"), "nocaps.org"),
    "text_caps": (("image", "texts", "image/id"),
                  ("train", "val", "test"), "textvqa.org/textcaps"),
    "scicap/first_sentence_subfig_no": (
        ("image", "caption", "image/id"),
        ("train", "val", "test"), "github.com/tingyaohsu/SciCap"),
    "screen2_words": (("image", "summary", "image/id"),
                      ("train", "dev", "test"),
                      "github.com/google-research-datasets/screen2words"),
    "widgetcap": (("image", "texts", "bbox", "image/id"),
                  ("train", "dev", "test"),
                  "github.com/google-research-datasets/widget-caption"),
    "coco35l": (("image", "captions", "language", "image/id"),
                tuple(), "arXiv:2205.12522 (Crossmodal-3600 companion)"),
    "xm3600": (("image", "captions", "image/id"),
               tuple(), "google.github.io/crossmodal-3600"),
    # --- Segmentation / detection ---
    "ref_coco_bv/refcocox_combined:1.4.0": (
        ("image", "objects/mask", "objects/bbox",
         "objects/refs/sentence"),
        ("train", "validation"), "github.com/lichengunc/refer"),
}


def describe(name):
  """Human-readable description of a catalog entry, for error messages."""
  if name not in CATALOG:
    return f"{name!r} is not in the transfer-dataset catalog."
  feats, splits, src = CATALOG[name]
  return (f"{name}: features={feats}, splits={splits}, raw data: {src}. "
          "Prepare it with the reference tfds builders (needs "
          "tensorflow_datasets) or export to jsonl and use "
          "data=dict(name='jsonl', fname=...).")
