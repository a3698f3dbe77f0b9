"""UViM stage-II smoke: VTT over random-init stage-I codes."""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=16, total_steps=15, batch_size=16)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps

  npatch = (arg.res // 4) ** 2
  config.input = dict(
      data=dict(name="synthetic", n=64, num_classes=8, h=24, w=24),
      batch_size=arg.batch_size,
      shuffle_buffer_size=32, num_threads=4, prefetch=1,
      pp=(f"decode|resize({arg.res})|value_range(0, 1)"
          "|onehot(8, key='label', key_result='labels')"
          "|reshape((1, 8), key='labels')"
          f"|tile(({npatch}, 1), key='labels')"
          "|keep('image', 'labels')"),
  )
  config.log_training_steps = 5
  config.ckpt_steps = 10

  config.oracle = dict(
      model_name="proj.uvim.vit",
      model=dict(
          inputs={"labels": (8,)}, outputs={"labels": (8,)},
          input_size=(arg.res, arg.res), patch_size=(4, 4), code_len=4,
          width=32, enc_depth=1, dec_depth=1, num_heads=2, dict_size=32,
          with_encoder_ctx=True, with_decoder_ctx=True),
      with_ctx=True,
      init_inputs=dict(labels=(1, npatch, 8)),
      init_ctx=(1, arg.res, arg.res, 3),
  )

  config.model_name = "proj.uvim.vtt"
  config.model = dict(
      patches={"size": (4, 4)}, num_heads=2, num_layers=1, mlp_dim=32,
      emb_dim=16, vocab_size=33, seq_len=4, input_size=(arg.res, arg.res))
  config.init_shapes = [(1, arg.res, arg.res, 3), (1, 4)]

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=2, decay_type="cosine")
  config.evals = {}
  return config
