"""Pretrain CaPPa (captioner with parallel prediction) on image-text.

Parity target: reference configs/proj/cappa/pretrain.py (arXiv:
2306.07915). The reference pretrains on a private corpus; this config
defaults to coco_captions so it is runnable from public data.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, runlocal=False, total_steps=366_500,
                       batch_size=8 * 1024, warmup_steps=10_000)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps if not arg.runlocal else 20

  res = 224
  text_len = 64
  tokenizer = "tokenize(max_len=64, model='c4_en', eos='sticky'," \
      " pad_value=0, inkey='text')"
  pp_train = (
      f"decode|resize({res})|flip_lr|value_range(-1, 1)"
      "|flatten|choice(inkey='captions/text', outkey='text')"
      f"|{tokenizer}|keep('image', 'labels')")
  config.input = dict(
      data=dict(name="coco_captions", split="train"),
      batch_size=arg.batch_size if not arg.runlocal else 8,
      shuffle_buffer_size=250_000 if not arg.runlocal else 25,
      pp=pp_train,
  )
  config.pp_modules = ["ops_general", "ops_image", "ops_text"]
  config.log_training_steps = 50
  config.ckpt_steps = 1000
  config.init_shapes = [(1, res, res, 3), (1, text_len)]

  config.model_name = "proj.cappa.cappa"
  config.model = dict(
      num_layers=12, num_heads=12, mlp_dim=3072, emb_dim=768,
      vocab_size=32_000, patches=(16, 16), seq_len=text_len,
      input_seq_len=(res // 16) ** 2, posemb_type="learn",
      decoder_num_layers=6, decoder_num_heads=12, decoder_mlp_dim=3072,
      decoder_emb_dim=768,
      # 75% of the batch is trained with parallel prediction.
      masked_pred_prob=0.75, masking_ratio=1.0)

  config.optax_name = "scale_by_adam"
  config.optax = dict(b2=0.95)
  config.grad_clip_norm = 1.0
  config.lr = 0.001
  config.wd = 0.0001
  config.schedule = dict(decay_type="cosine",
                         warmup_steps=arg.warmup_steps)

  config.evals = {}
  config.evals.val_pplx = dict(
      type="proj.cappa.perplexity", pred="perplexity",
      data=dict(name="coco_captions", split="val"),
      pp_fn=pp_train, log_steps=1000)
  return config
