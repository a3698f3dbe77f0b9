"""GIVT-based UViM for NYU depth: AR model over frozen ViT-VAE latents.

Parity target: reference configs/proj/givt/givt_nyu_depth.py.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=512, patch_size=16, runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0
  config.min_depth = 0.001
  config.max_depth = 10.0
  config.total_epochs = 50

  config.input = dict(
      data=dict(name="nyu_depth_v2", split="train"),
      batch_size=512 if not arg.runlocal else 8,
      shuffle_buffer_size=25_000 if not arg.runlocal else 10,
      pp=("decode|nyu_depth"
          "|randu('fliplr')|det_fliplr(key='image')"
          "|det_fliplr(key='labels')"
          "|inception_box|crop_box(key='image')|crop_box(key='labels')"
          f"|resize({arg.res})"
          f"|resize({arg.res}, key='labels', method='nearest')"
          "|value_range(-1, 1)|keep('image', 'labels')"),
  )
  config.pp_modules = ["ops_general", "ops_image", "proj.uvim.pp_ops"]
  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.cond_image = "image"  # Transformer encoder conditions on RGB.

  # Frozen stage-I ViT-VAE over the depth maps.
  config.vae = dict(
      model_name="proj.givt.vit",
      inkey="labels",
      model=dict(
          input_size=(arg.res, arg.res),
          patch_size=(arg.patch_size, arg.patch_size),
          code_len=256, width=768, enc_depth=6, dec_depth=12,
          mlp_dim=3072, num_heads=12, codeword_dim=16,
          bottleneck_resize=True,
          inout_specs={"depth": (0, 256)}),
      model_init="path/to/vae_nyu_depth_ckpt",
      init_shapes=[(1, arg.res, arg.res, 1)],
  )

  config.model_name = "proj.givt.givt"
  config.model = dict(
      num_layers=6,  # image encoder (cross-attended by the decoder)
      num_decoder_layers=24, num_heads=16, mlp_dim=4096, emb_dim=1024,
      patches=(arg.patch_size, arg.patch_size),
      input_size=(arg.res, arg.res),
      seq_len=256, out_dim=16, num_mixtures=1, style="ar",
      num_labels=None)
  config.ar_generation_config = dict(temp=0.9, temp_probs=1.0)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 1e-6
  config.schedule = dict(decay_type="cosine", warmup_steps=4_000)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.nyu_depth = dict(
      type="proj.givt.nyu_depth", pred="depth",
      data=dict(name="nyu_depth_v2", split="validation"),
      pp_fn=("decode|nyu_depth|nyu_eval_crop"
             f"|resize({arg.res})"
             f"|resize({arg.res}, key='labels', method='nearest')"
             "|value_range(-1, 1)"
             "|copy('labels', 'ground_truth')"
             "|keep('image', 'ground_truth')"),
      log_steps=10_000)
  return config
