"""GIVT smoke: tiny GIVT over a random-init tiny VAE's latents."""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=16, total_steps=15, batch_size=16,
                       style="ar")
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps

  config.input = dict(
      data=dict(name="synthetic", n=64, num_classes=10, h=24, w=24),
      batch_size=arg.batch_size,
      shuffle_buffer_size=32, num_threads=4, prefetch=1,
      pp=(f"decode|resize({arg.res})|value_range(-1, 1)"
          "|keep('image', 'label')"),
  )
  config.log_training_steps = 5
  config.ckpt_steps = 10

  config.vae = dict(
      model_name="proj.givt.vae",
      model=dict(codeword_dim=4, filters=8, num_res_blocks=1,
                 channel_multipliers=(1, 2)),
      init_shapes=[(1, arg.res, arg.res, 3)],
  )

  config.model_name = "proj.givt.givt"
  config.model = dict(
      num_decoder_layers=2, num_heads=2, mlp_dim=32, emb_dim=16,
      num_labels=10, seq_len=(arg.res // 2) ** 2, out_dim=4,
      num_mixtures=2, style=arg.style,
      drop_labels_probability=0.1 if arg.style == "ar" else 0.0,
  )

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=2, decay_type="cosine")
  config.evals = {}
  return config
