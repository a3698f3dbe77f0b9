"""PaliGemma transfer to ScienceQA multiple choice.

Parity target: reference configs/proj/paligemma/transfers/science_qa.py
(dataset/prompt/split/hyperparameter recipe). Requires the science_qa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


QFMT = {
    "QM": "{question}\\nOptions: {indexed_choices}",
    "QCM": ("Context: {hint}\\nQuestion: {question}\\nOptions:"
            " {indexed_choices}\\nAnswer:"),
}
AFMT = {
    "A": "The answer is {indexed_answer}.",
    "AE": "The answer is {indexed_answer}. BECAUSE: {solution}",
    "ALE": ("The answer is {indexed_answer}. BECAUSE: {lecture}"
            " {solution}"),
}


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=224, final_split=False,
                    qfmt="QCM", afmt="A")
  text_len = 512
  before = (
      "drop('indexed_choices', 'indexed_answer')",
      "sci_qa_choices_shuffle(choice_str_inkey='choices',"
      " ans_inkey='answer')")

  c.input = c7n.parse_arg("")
  c.input.data = dict(
      name="science_qa",
      split="train+val" if c.final_split else "train")
  c.input.pp = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      *before,
      f"strfmt({QFMT[c.qfmt]!r}, outkey='prefix')",
      f"strfmt({AFMT[c.afmt]!r}, outkey='suffix')",
      c7n.combine_and_keep_train(text_len),
  ])

  c.evals = {}
  pp_eval = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      *before,
      f"strfmt({QFMT[c.qfmt]!r}, outkey='prefix')",
      f"strfmt({AFMT['A']!r}, outkey='answer')",
      c7n.combine_and_keep_eval(text_len, keep=("answer", "question_id")),
  ])
  for name, split in [("minival", "val"), ("eval", "test")]:
    c.evals[f"science_qa/{name}"] = dict(
        type="proj.paligemma.transfers.science_qa",
        pred="decode", pred_kw={"max_decode_len": text_len},
        log_percent=0.1, tokenizer=c7n.TOKENIZER,
        data=dict(name="science_qa", split=split), pp_fn=pp_eval)

  c7n.mkbase(c, res=c.res, total_epochs=20, lr=1e-5, wd=1e-6)
  c.pp_modules += ["proj.paligemma.sciqa_ops"]
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
