"""Smoke transfer config over a locally BUILT vqa dataset (test fixture).

Mirrors the vqav2 transfer's structure — built-`vqa` DataSource with a
union+slice split expression, answer-prefix pp, vqav2 evaluator — on a
tiny model so tests/test_builders.py can train it e2e in seconds. The
dataset must have been produced by datasets/builders (BV_DATA_DIR).
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=16, total_steps=4, batch_size=4)
  c = mlc.ConfigDict()
  c.seed = 0
  c.total_steps = arg.total_steps
  c.init_shapes = [(1, arg.res, arg.res, 3), (1, 12)]

  tok = "model='test(256)'"
  pp_train = "|".join([
      "decode", f"resize({arg.res})", "value_range(-1, 1)",
      "strfmt('answer en {question_text}', outkey='prefix_text')",
      "choice_no_replacement(inkey='answers', outkey='suffix_text')",
      f"tok({tok}, inkey='prefix_text', outkey='prefix', bos='yes')",
      f"tok({tok}, inkey='suffix_text', outkey='suffix', eos='yes')",
      "masked_concat(['prefix', 'suffix'], mask_ar=[0, 1],"
      " mask_loss=[0, 1])",
      "tolen(12, pad_value=0, key='text')",
      "tolen(12, pad_value=0, key='mask_ar')",
      "tolen(12, pad_value=0, key='mask_loss')",
      "keep('image', 'text', 'mask_ar', 'mask_loss')",
  ])
  c.input = dict(
      # Exercises the tfds-style union + slice over the built splits.
      data=dict(name="vqa", split="train + validation[:-1]"),
      batch_size=arg.batch_size,
      shuffle_buffer_size=16,
      num_threads=2,
      prefetch=1,
      pp=pp_train,
  )

  c.log_training_steps = 2
  c.ckpt_steps = 100

  c.model_name = "proj.paligemma.paligemma"
  c.model = dict(
      img=dict(variant="mu/16", pool_type="none", posemb="sincos2d",
               head_zeroinit=False),
      llm=dict(variant="gemma_test", scan=True, cache_dtype=None),
  )

  c.optax_name = "scale_by_adam"
  c.lr = 1e-3
  c.wd = 0.0
  c.schedule = dict(warmup_steps=2, decay_type="cosine")
  c.decode = dict(max_decode_len=6, eos_token=1)

  pp_eval = "|".join([
      "decode", f"resize({arg.res})", "value_range(-1, 1)",
      "strfmt('answer en {question_text}', outkey='prefix_text')",
      f"tok({tok}, inkey='prefix_text', outkey='prefix', bos='yes')",
      "setdefault('suffix', '')",
      "masked_concat(['prefix'], mask_ar=[0], mask_input=[1])",
      "tolen(12, pad_value=0, key='text')",
      "tolen(12, pad_value=0, key='mask_ar')",
      "tolen(12, pad_value=0, key='mask_input')",
      "keep('image', 'text', 'mask_ar', 'mask_input', 'answers',"
      " 'answer_type', 'question_type', 'question_id')",
  ])
  c.evals = dict()
  c.evals["vqav2/minival"] = dict(
      type="proj.paligemma.transfers.vqav2",
      pred="decode", pred_kw={"max_decode_len": 6},
      tokenizer="test(256)",
      data=dict(name="vqa", split="validation[-1:]"),
      pp_fn=pp_eval, log_steps=4)
  return c
