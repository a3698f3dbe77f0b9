"""CapPa smoke config: tiny captioner on synthetic captions."""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=16, total_steps=15, batch_size=16)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps
  config.init_shapes = [(1, arg.res, arg.res, 3), (1, 8)]

  config.input = dict(
      data=dict(name="synthetic", n=64, num_classes=8, h=24, w=24),
      batch_size=arg.batch_size,
      shuffle_buffer_size=32, num_threads=4, prefetch=1,
      pp=(f"decode|resize({arg.res})|value_range(-1, 1)"
          "|strfmt('photo number {label}', outkey='text')"
          "|tokenize(8, eos='yes', model='test(64)', pad_value=0,"
          " inkey='text', outkey='labels')"
          "|keep('image', 'labels')"),
  )
  config.log_training_steps = 5
  config.ckpt_steps = 10

  config.model_name = "proj.cappa.cappa"
  config.model = dict(
      num_heads=2, num_layers=2, mlp_dim=64, emb_dim=32,
      vocab_size=64, seq_len=8, patches=(8, 8),
      posemb_type="learn",
      masked_pred_prob=0.5, masking_ratio=0.5,
  )

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=2, decay_type="cosine")

  config.evals = dict(
      perplexity=dict(
          type="proj.cappa.perplexity", pred="perplexity",
          data=dict(name="synthetic", n=16, num_classes=8, h=24, w=24),
          pp_fn=config.input.pp, log_steps=10),
  )
  return config
