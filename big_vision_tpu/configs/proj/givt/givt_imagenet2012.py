"""GIVT class-conditional generation on ImageNet (256/512px).

Parity target: reference configs/proj/givt/givt_imagenet2012.py.
Needs imagenet2012 and a pretrained GIVT CNN-VAE (malib) checkpoint;
the published VAEs load via `proj.givt.cnn` with use_ema_params=True.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc

GIVT_MODELS = {
    "base": dict(num_decoder_layers=12, num_heads=12, mlp_dim=3072,
                 emb_dim=768, dec_dropout_rate=0.1),
    "default": dict(num_decoder_layers=24, num_heads=16, mlp_dim=4096,
                    emb_dim=1024, dec_dropout_rate=0.2),
    "large": dict(num_decoder_layers=48, num_heads=16, mlp_dim=8192,
                  emb_dim=1536, dec_dropout_rate=0.3),
}


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=256, patch_size=16, style="ar",
                       model_size="default", runlocal=False,
                       adaptor=False)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_epochs = 500

  config.input = dict(
      data=dict(name="imagenet2012", split="train[4096:]"),
      batch_size=8 * 1024 if not arg.runlocal else 8,
      shuffle_buffer_size=25_000 if not arg.runlocal else 10,
      pp=(f"decode_jpeg_and_inception_crop({arg.res}, area_min=80,"
          " area_max=100, ratio_min=1.0, ratio_max=1.0,"
          " method='bicubic', antialias=True)"
          "|flip_lr|value_range(-1, 1, key='image')"
          "|copy('label', 'labels')|keep('image', 'labels')"),
  )
  pp_eval = (f"decode|resize_small({arg.res}, inkey='image', outkey='image',"
             " method='bicubic', antialias=True)"
             f"|central_crop({arg.res})|value_range(-1, 1, key='image')"
             "|copy('label', 'labels')|keep('image', 'labels')")

  config.log_training_steps = 50
  config.ckpt_steps = 1000
  config.keep_ckpt_steps = None
  config.ckpt_timeout = 30

  # Sampling settings (used by generation evals / inference).
  config.ar_generation_config = dict(
      temp=0.95, temp_probs=1.0, beam_size=1, fan_size=1,
      rand_top_k=False, rand_top_k_temp=1.0, cfg_inference_weight=0.4)
  config.masked_generation_config = dict(
      choice_temperature=35.0, ordering="maskgit",
      cfg_inference_weight=0.0, schedule="cosine")

  # Frozen MaskGIT-style CNN Gaussian-VAE tokenizer (published malib ckpt).
  config.vae = dict(
      model_name="proj.givt.cnn",
      model=dict(code_len=(arg.res // arg.patch_size) ** 2,
                 codeword_dim=16, filters=128, num_res_blocks=2,
                 channel_multipliers=(1, 1, 2, 2, 4),
                 conv_downsample=False, activation_fn="swish",
                 norm_type="GN", malib_ckpt=True),
      model_init="path/to/givt_imagenet_vae_ckpt",
      model_load=dict(malib_ckpt=True, use_ema_params=True),
      init_shapes=[(1, arg.res, arg.res, 3)],
  )

  config.model_name = "proj.givt.givt"
  config.model = mlc.ConfigDict(dict(
      **GIVT_MODELS[arg.model_size],
      num_layers=0,
      num_labels=1000,
      seq_len=config.vae.model["code_len"],
      out_dim=config.vae.model["codeword_dim"],
      num_mixtures=16,
      posemb_type="learn",
      scale_tol=1e-6,
      style=arg.style,
      min_masking_rate_training=0.3,
      mask_style="concat",
      drop_labels_probability=0.1,
      fix_square_plus=True,
      per_channel_mixtures=False,
      scan=True,
      remat_policy="nothing_saveable"))
  config.model_init = ""

  # Optional jointly-trained invertible adaptor between VAE and GIVT.
  config.adaptor_name = "proj.givt.adaptor" if arg.adaptor else ""
  config.adaptor = dict(model=dict(
      num_blocks=8,
      num_channels_bottleneck=4 * config.model.out_dim))

  config.optax_name = "scale_by_adam"
  config.optax = dict(b2=0.95)
  config.lr = 1e-3
  config.wd = 1e-4
  config.schedule = dict(decay_type="cosine", warmup_percent=0.1)
  config.grad_clip_norm = 1.0

  # FSDP training by default.
  config.sharding_strategy = [(".*", 'fsdp(axis="data")')]
  config.sharding_rules = [("act_batch", ("data",))]

  if arg.style == "masked":
    config.model.dec_dropout_rate = 0.4
    config.wd = 0.0
    if arg.res == 512:
      config.masked_generation_config["choice_temperature"] = 140
  elif arg.res == 512 and arg.model_size == "large":
    # GIVT-Causal 512px: fold latent pairs via pixel shuffle.
    config.model.dec_dropout_rate = 0.1
    config.vae.model["code_len"] //= 2
    config.vae.model["pixel_shuffle_patch_size"] = (1, 2)
    config.model.seq_len //= 2
    config.model.out_dim = config.vae.model["codeword_dim"] * 2
    config.model.num_mixtures = 32
    config.adaptor["model"]["num_channels_bottleneck"] = (
        8 * config.model.out_dim)
    config.adaptor["model"]["pixel_shuffle_patch_size"] = (1, 2)
    config.ar_generation_config["temp"] = 0.9
    config.ar_generation_config["cfg_inference_weight"] = 0.9

  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name=config.input["data"]["name"],
                split=f"train[:{4096 if not arg.runlocal else 8}]"),
      pp_fn=pp_eval,
      log_steps=1000 if not arg.runlocal else 20)
  config.evals.save_pred_sampling = dict(
      type="proj.givt.save_predictions",
      pp_fn=pp_eval,
      log_steps=10_000,
      pred="sample",
      batch_size=512,
      data=dict(name=config.input["data"]["name"], split="validation[:512]"),
      outfile="inference_sampled.npz")

  if arg.runlocal:
    config.input["batch_size"] = 4
    config.input["shuffle_buffer_size"] = 10
    config.log_training_steps = 5
    config.model.num_decoder_layers = 2
    config.evals.val["data"]["split"] = "validation[:16]"
    config.evals.val["log_steps"] = 20

  return config
