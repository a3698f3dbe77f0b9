"""UViM stage-I: VQ-VAE over COCO panoptic maps.

Parity target: reference configs/proj/uvim/vqvae_coco_panoptic.py
(model/pp/optimizer recipe). Needs the coco/2017_panoptic dataset
(tfds-gated in this image).
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=512, patch_size=16, runlocal=False,
                       singlehost=False)
  config = mlc.ConfigDict()
  config.seed = 0

  config.input = dict(
      data=dict(name="coco/2017_panoptic", split="train[4096:]"),
      batch_size=1024, shuffle_buffer_size=25_000,
      pp="decode|coco_panoptic|concat(['semantics', 'instances'], 'labels')|randu('fliplr')|det_fliplr(key='image')|det_fliplr(key='labels')|inception_box|crop_box(key='image')|crop_box(key='labels')|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|make_canonical|keep('image', 'labels')".format(res=arg.res),
  )
  pp_eval = "decode|coco_panoptic|concat(['semantics', 'instances'], 'labels')|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|make_canonical|keep('image', 'labels')".format(res=arg.res)
  config.pp_modules = ["ops_general", "ops_image", "proj.uvim.pp_ops"]
  config.total_epochs = 1000

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.task = "panoptic"
  px = arg.patch_size ** 2
  config.model_name = "proj.uvim.vit"
  config.model = dict(
      inputs={"semantics": (133 + 1, px),  # +1 for void
              "instances": (100, px)},     # COCO: <=98 per image
      outputs={"semantics": (133 + 1, px), "instances": (100, px)},
      input_size=(arg.res, arg.res),
      patch_size=(arg.patch_size, arg.patch_size),
      code_len=256, width=768, enc_depth=6, dec_depth=12,
      mlp_dim=3072, num_heads=12,
      dict_size=4096, codeword_dim=768, dict_momentum=0.995,
      with_encoder_ctx=True, with_decoder_ctx=True,
      code_dropout="random", bottleneck_resize=True)
  config.with_ctx = True
  config.freeze_dict = False
  config.w_commitment = 0.0

  config.optax_name = "big_vision.scale_by_adafactor"
  config.optax = dict(beta2_cap=0.95)
  config.lr = 4e-4
  config.wd = 4e-5
  config.schedule = dict(decay_type="cosine", warmup_steps=4_000)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.val = dict(
      type="proj.uvim.compute_mean", pred="validation",
      data=dict(name="coco/2017_panoptic", split="train[:4096]"),
      pp_fn=pp_eval, log_steps=250)
  for name, split in [("coco_panoptic_holdout", "train[:4096]"),
                      ("coco_panoptic", "validation")]:
    config.evals[name] = dict(
        type="proj.uvim.coco_panoptic", pred="panoptic",
        data=dict(name="coco/2017_panoptic", split=split),
        pp_fn=pp_eval.replace(
            "keep('image', 'labels')",
            "copy('labels', 'ground_truth')"
            "|keep('image', 'labels', 'ground_truth')"),
        log_steps=10_000)

  if arg.singlehost:
    config.input["batch_size"] = 128
  elif arg.runlocal:
    config.input["batch_size"] = 16
    config.input["shuffle_buffer_size"] = 10
  return config
