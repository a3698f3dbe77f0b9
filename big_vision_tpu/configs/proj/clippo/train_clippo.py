"""CLIPPO: contrastive training with one tower for images AND text
rendered as images.

Parity target: reference configs/proj/clippo/train_clippo.py
(arXiv:2212.08045). Defaults to coco_captions; rendered text uses the
render_unifont pp op.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=224, runlocal=False, variant="B/16")
  config = mlc.ConfigDict()
  config.seed = 0

  config.input = dict(
      data=dict(name="coco_captions", split="train"),
      batch_size=4000 if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 50,
      # The rendered-text image rides in "labels": the siglip trainer's
      # contract is model(batch["image"], batch["labels"]), which for the
      # one-tower model is (image, rendered_text_image).
      pp=(f"decode|resize({arg.res})|flip_lr|value_range(-1, 1)"
          "|flatten|choice(inkey='captions/text', outkey='texts')"
          f"|render_unifont({arg.res}, outkey='labels')"
          "|value_range(-1, 1, inkey='labels', outkey='labels')"
          "|keep('image', 'labels')"),
  )
  config.total_steps = 400 if not arg.runlocal else 10
  config.pp_modules = ["ops_general", "ops_image", "ops_text",
                       "proj.clippo.pp_ops"]
  config.init_shapes = [(1, arg.res, arg.res, 3),
                        (1, arg.res, arg.res, 3)]

  config.log_training_steps = 50
  config.ckpt_steps = 1000
  config.loss_use_global_batch = True

  config.model_name = "proj.clippo.one_tower"
  config.model = dict(
      image=dict(variant=arg.variant, pool_type="map"),
      temperature_init=10.0, out_dim=768)
  config.model_init = f"howto-i21k-{arg.variant.split('/')[0]}" \
      f"/{arg.variant.split('/')[1]}"

  config.optax_name = "scale_by_adam"
  config.lr = 1e-4
  config.wd = 3e-4
  config.schedule = dict(
      decay_type="rsqrt", timescale=5_000,
      warmup_steps=5_000 if not arg.runlocal else 5,
      cooldown_steps=5_000 if not arg.runlocal else 5)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.retrieval_coco = dict(
      type="proj.image_text.retrieval",
      data=dict(name="coco_captions", split="val"),
      log_steps=1000,
      pp_img=f"resize({arg.res})|value_range(-1, 1)",
      pp_txt=(f"render_unifont({arg.res}, outkey='labels')"
              "|value_range(-1, 1, inkey='labels', outkey='labels')"),
      txt_name=("captions", "text"))
  return config
