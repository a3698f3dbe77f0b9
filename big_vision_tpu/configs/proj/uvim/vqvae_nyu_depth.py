"""UViM stage-I: VQ-VAE over binned NYU depth maps.

Parity target: reference configs/proj/uvim/vqvae_nyu_depth.py. Needs
the nyu_depth_v2 dataset (tfds-gated).
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
      batch_size=1024, shuffle_buffer_size=25_000,
      pp=("decode|nyu_depth|randu('fliplr')|det_fliplr(key='image')|det_fliplr(key='labels')|inception_box|crop_box(key='image')|crop_box(key='labels')|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|keep('image', 'labels')").format(res=arg.res),
  )
  pp_eval = ("decode|nyu_depth|nyu_eval_crop|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|keep('image', 'labels')").format(res=arg.res)
  config.pp_modules = ["ops_general", "ops_image",
                       "proj.uvim.pp_ops", "proj.givt.pp_ops"]
  config.total_epochs = 200

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.task = "depth"
  px = arg.patch_size ** 2
  config.model_name = "proj.uvim.vit"
  config.model = dict(
      inputs={"depth": (256, px)}, outputs={"depth": (256, px)},
      input_size=(arg.res, arg.res),
      patch_size=(arg.patch_size, arg.patch_size),
      code_len=256, width=768, enc_depth=6, dec_depth=12,
      mlp_dim=3072, num_heads=12,
      dict_size=4096, codeword_dim=768,
      with_encoder_ctx=True, with_decoder_ctx=True,
      code_dropout="random", bottleneck_resize=True)
  config.with_ctx = True
  config.freeze_dict = False  # Stage I trains the codebook dictionary.
  config.w_commitment = 0.0   # Ref vqvae_nyu_depth.py:98-99.

  config.optax_name = "big_vision.scale_by_adafactor"
  config.optax = dict(beta2_cap=0.95)
  config.lr = 1e-3
  config.wd = 1e-5
  config.schedule = dict(decay_type="cosine", warmup_steps=4_000)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.val = dict(
      type="proj.uvim.compute_mean", pred="validation",
      data=dict(name="nyu_depth_v2", split="validation"),
      pp_fn=pp_eval, log_steps=250)
  config.evals.nyu_depth = dict(
      type="proj.uvim.nyu_depth", pred="depth",
      data=dict(name="nyu_depth_v2", split="validation"),
      pp_fn=pp_eval + "|copy('labels', 'ground_truth')",
      log_steps=10_000)
  if arg.runlocal:
    config.input["batch_size"] = 16
  return config
