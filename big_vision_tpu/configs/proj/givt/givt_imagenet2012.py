"""GIVT class-conditional generation on ImageNet (256px).

Parity target: reference configs/proj/givt/givt_imagenet2012.py.
Needs imagenet2012 (tfds-gated) and a pretrained GIVT CNN-VAE
checkpoint.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc

GIVT_MODELS = {
    "base": dict(num_decoder_layers=12, num_heads=12, mlp_dim=3072,
                 emb_dim=768),
    "default": dict(num_decoder_layers=24, num_heads=16, mlp_dim=4096,
                    emb_dim=1024),
    "large": dict(num_decoder_layers=48, num_heads=16, mlp_dim=8192,
                  emb_dim=1536),
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
  config.log_training_steps = 50
  config.ckpt_steps = 1000

  # Frozen CNN Gaussian-VAE tokenizer.
  config.vae = dict(
      model_name="proj.givt.vae",
      model=dict(codeword_dim=16, filters=128, num_res_blocks=2,
                 channel_multipliers=(1, 1, 2, 2, 4)),
      model_init="path/to/givt_imagenet_vae_ckpt",
      init_shapes=[(1, arg.res, arg.res, 3)],
  )

  config.model_name = "proj.givt.givt"
  config.model = dict(
      **GIVT_MODELS[arg.model_size],
      seq_len=(arg.res // arg.patch_size) ** 2,
      out_dim=config.vae.model["codeword_dim"],
      num_mixtures=16,
      num_labels=1000,
      style=arg.style,
      drop_labels_probability=0.1,
      dec_dropout_rate={"base": 0.1, "default": 0.2,
                    "large": 0.3}[arg.model_size])

  # Sampling settings (used by generation evals / inference).
  config.ar_generation_config = dict(
      temp=0.95, temp_probs=1.0, cfg_inference_weight=0.4)
  config.masked_generation_config = dict(
      choice_temperature=35.0, ordering="maskgit",
      cfg_inference_weight=0.0, schedule="cosine")

  config.optax_name = "scale_by_adam"
  config.optax = dict(b2=0.95)
  config.lr = 1e-3
  config.wd = 1e-4
  config.schedule = dict(decay_type="cosine", warmup_percent=0.1)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="nll",
      data=dict(name="imagenet2012", split="train[:4096]"),
      pp_fn=config.input["pp"].replace(
          "decode_jpeg_and_inception_crop", "decode|central_crop").split(
              "|flip_lr")[0]
      + f"|value_range(-1, 1)|copy('label', 'labels')"
        "|keep('image', 'labels')",
      log_steps=1000)
  return config
