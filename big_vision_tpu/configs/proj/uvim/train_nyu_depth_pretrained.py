"""UViM stage-II for NYU depth (frozen stage-I oracle).

Parity target: reference configs/proj/uvim/train_nyu_depth_pretrained.py.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=512, patch_size=16, runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0
  config.min_depth = 0.001
  config.max_depth = 10.0

  config.input = dict(
      data=dict(name="nyu_depth_v2", split="train"),
      batch_size=512, shuffle_buffer_size=25_000,
      pp=("decode|nyu_depth|randu('fliplr')|det_fliplr(key='image')|det_fliplr(key='labels')|inception_box|crop_box(key='image')|crop_box(key='labels')|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|keep('image', 'labels')").format(res=arg.res),
  )
  pp_eval = ("decode|nyu_depth|nyu_eval_crop|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|keep('image', 'labels')").format(res=arg.res)
  config.pp_modules = ["ops_general", "ops_image",
                       "proj.uvim.pp_ops", "proj.givt.pp_ops"]
  config.total_epochs = 50
  config.init_shapes = [(1, arg.res, arg.res, 3)]

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.task = "depth"
  px = arg.patch_size ** 2
  config.oracle = dict(
      model_name="proj.uvim.vit",
      model=dict(
          inputs={"depth": (256, px)}, outputs={"depth": (256, px)},
          input_size=(arg.res, arg.res),
          patch_size=(arg.patch_size, arg.patch_size),
          code_len=256, width=768, enc_depth=6, dec_depth=12,
          mlp_dim=3072, num_heads=12, dict_size=4096,
          codeword_dim=768, with_encoder_ctx=True,
          with_decoder_ctx=True, code_dropout="random",
          bottleneck_resize=True),
      model_init="path/to/vqvae_nyu_depth_ckpt")

  config.model_name = "proj.uvim.vtt"
  config.model = dict(
      patches=(arg.patch_size, arg.patch_size),
      input_size=(arg.res, arg.res), seq_len=256,
      vocab_size=4096 + 1,
      num_layers=24, num_heads=16, mlp_dim=4096, emb_dim=1024)
  config.model_init = "howto-i21k-L/16"

  config.optax_name = "big_vision.scale_by_adafactor"
  config.optax = dict(beta2_cap=0.95)
  config.lr = 0.001
  config.wd = 1e-6
  config.schedule = dict(decay_type="cosine", warmup_steps=4_000)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.val = dict(
      type="proj.uvim.compute_mean", pred="validation",
      data=dict(name="nyu_depth_v2", split="validation"),
      pp_fn=pp_eval, log_steps=1000)
  config.evals.nyu_depth = dict(
      type="proj.uvim.nyu_depth", pred="depth",
      data=dict(name="nyu_depth_v2", split="validation"),
      pp_fn=pp_eval + "|copy('labels', 'ground_truth')",
      log_steps=10_000)
  if arg.runlocal:
    config.input["batch_size"] = 16
  return config
