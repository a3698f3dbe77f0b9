"""UViM stage-II: LM over frozen VQ-VAE codes for COCO panoptic.

Parity target: reference
configs/proj/uvim/train_coco_panoptic_pretrained.py. Needs the
coco/2017_panoptic dataset and a stage-I checkpoint.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc

VQVAE_BASE = dict(
    code_len=256, width=768, enc_depth=6, dec_depth=12, mlp_dim=3072,
    num_heads=12, dict_size=4096, codeword_dim=768,
    with_encoder_ctx=True, with_decoder_ctx=True,
    code_dropout="random", bottleneck_resize=True)

VTT_LARGE = dict(num_layers=24, num_heads=16, mlp_dim=4096,
                 emb_dim=1024)


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=512, patch_size=16, runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0

  config.input = dict(
      data=dict(name="coco/2017_panoptic", split="train[4096:]"),
      batch_size=512, shuffle_buffer_size=25_000,
      pp="decode|coco_panoptic|concat(['semantics', 'instances'], 'labels')|randu('fliplr')|det_fliplr(key='image')|det_fliplr(key='labels')|inception_box|crop_box(key='image')|crop_box(key='labels')|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|make_canonical|keep('image', 'labels')".format(res=arg.res),
  )
  pp_eval = "decode|coco_panoptic|concat(['semantics', 'instances'], 'labels')|resize({res})|resize({res}, key='labels', method='nearest')|value_range(-1, 1)|make_canonical|keep('image', 'labels')".format(res=arg.res)
  config.pp_modules = ["ops_general", "ops_image", "proj.uvim.pp_ops"]
  config.total_epochs = 200
  config.init_shapes = [(1, arg.res, arg.res, 3)]

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  # Frozen stage-I oracle.
  config.task = "panoptic"
  px = arg.patch_size ** 2
  config.oracle = dict(
      model_name="proj.uvim.vit",
      model=dict(
          inputs={"semantics": (134, px), "instances": (100, px)},
          outputs={"semantics": (134, px), "instances": (100, px)},
          input_size=(arg.res, arg.res),
          patch_size=(arg.patch_size, arg.patch_size),
          **VQVAE_BASE),
      model_init="path/to/vqvae_coco_panoptic_ckpt")

  # Stage-II vision-text-transformer over the codes.
  config.model_name = "proj.uvim.vtt"
  config.model = dict(
      patches=(arg.patch_size, arg.patch_size),
      input_size=(arg.res, arg.res),
      seq_len=VQVAE_BASE["code_len"],
      vocab_size=VQVAE_BASE["dict_size"] + 1,
      **VTT_LARGE)
  config.model_init = "howto-i21k-L/16"

  config.optax_name = "big_vision.scale_by_adafactor"
  config.optax = dict(beta2_cap=0.95)
  config.lr = 0.001
  config.wd = 1e-6
  config.lr_mults = [("pos_embedding_encoder.*", 0.1),
                     ("EmbedPatches.*", 0.1), ("encoder.*", 0.1),
                     (".*", 1.0)]
  config.schedule = dict(decay_type="cosine", warmup_steps=4_000)
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.val = dict(
      type="proj.uvim.compute_mean", pred="validation",
      data=dict(name="coco/2017_panoptic", split="train[:4096]"),
      pp_fn=pp_eval, log_steps=1000)
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

  if arg.runlocal:
    config.input["batch_size"] = 16
  return config
